"""Blocked record-linkage scoring — the Fellegi–Sunter-style second
stage of entity resolution: within each block (e.g. a phonetic key
from ``stages/phonetic.py``), score every candidate pair by a sum of
integer per-field agreement weights and keep pairs clearing a
threshold.  Blocking bounds the quadratic comparison space; the score
is all-integer so every decision replays bit-exactly in SQL
(``CASE WHEN a.col = b.col THEN w ELSE 0 END`` sums).

Agreement semantics: a field agrees iff BOTH values are non-NULL and
equal (SQL ``=`` null-propagation ≡ the engine's valid∧valid∧equal).

Scale shape: ONE block-key exchange; the kernel enumerates each
block's pair triangle with the vectorized triangular index decode
(the q186 pattern) and scores with Arrow ``equal`` kernels — no
per-row Python.  Blocks larger than ``max_block`` are skipped with a
logged warning (the q42/q186 bounded-group convention, mirrored by
the oracle's HAVING).

Reference analog: none (no entity resolution in the reference);
completes the blocking→scoring linkage path started by
``phonetic.add_soundex_key``.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["blocked_pair_score"]


def blocked_pair_score(ds, *, key_col: str, id_col: str,
                       fields: Mapping[str, int], threshold: int,
                       max_block: int = 4096,
                       num_partitions: int = 16):
    """Pairs ``(id_a, id_b, score:int64)`` with ``id_a < id_b`` from
    the same block and ``score = Σ weight[field agrees] ≥ threshold``.
    NULL block keys / ids drop."""
    from .partition import partitioned_map

    fields = dict(fields)
    if not fields:
        raise ValueError("blocked_pair_score: need at least one field")

    schema = ds.schema()
    base = getattr(schema, "base_schema", schema)
    id_type = base.field(id_col).type

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.fill_null(pc.and_(pc.is_valid(b[key_col]),
                                    pc.is_valid(b[id_col])), False)
        if not pc.all(keep).as_py():
            b = b.filter(keep)
        return b.select([key_col, id_col, *fields])

    empty = pa.table({"id_a": pa.array([], id_type),
                      "id_b": pa.array([], id_type),
                      "score": pa.array([], pa.int64())})

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        keys = t[key_col].combine_chunks()
        codes = pc.dictionary_encode(keys).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        new_run = np.concatenate([[True], codes[1:] != codes[:-1]])
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.concatenate([starts, [len(codes)]]))
        keep_seg = lens <= max_block
        n_skip = int((~keep_seg).sum())
        if n_skip:
            import logging

            logging.getLogger(__name__).warning(
                "blocked_pair_score: skipped %d blocks with > %d rows",
                n_skip, max_block)
        sl, ss = lens[keep_seg], starts[keep_seg]
        from ..functions.segments import triangular_pairs

        i_glob, j_glob, _seg = triangular_pairs(ss, sl)
        if len(i_glob) == 0:
            return empty
        # strict id inequality: duplicated ids inside a block must not
        # self-pair (the oracle joins on id_a < id_b)
        ids_all = t[id_col].combine_chunks()
        ids_np = ids_all.to_numpy(zero_copy_only=False)
        ne = ids_np[i_glob] != ids_np[j_glob]
        i_glob, j_glob = i_glob[ne], j_glob[ne]
        if len(i_glob) == 0:
            return empty
        ia = pa.array(i_glob, pa.int64())
        ja = pa.array(j_glob, pa.int64())
        score = np.zeros(len(i_glob), np.int64)
        for col, w in fields.items():
            a = t[col].combine_chunks()
            va, vb = a.take(ia), a.take(ja)
            agree = pc.fill_null(pc.and_(
                pc.and_(pc.is_valid(va), pc.is_valid(vb)),
                pc.equal(va, vb)), False).to_numpy(
                zero_copy_only=False)
            score += np.where(agree, int(w), 0)
        m = score >= threshold
        # deterministic (id_a < id_b) orientation: rows are sorted by
        # (key, id) so i_glob's id is the smaller one
        return pa.table({
            "id_a": ids_all.take(pa.array(i_glob[m], pa.int64())),
            "id_b": ids_all.take(pa.array(j_glob[m], pa.int64())),
            "score": pa.array(score[m])})

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    return partitioned_map(prepped, kernel, key=key_col,
                           sort_keys=[key_col, id_col],
                           num_partitions=num_partitions,
                           strategy="tasks")
