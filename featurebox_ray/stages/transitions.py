"""Event-type transition counts (behavioral Markov bigrams) — for every
ordered pair of CONSECUTIVE events of the same key, count global
``(from_type, to_type)`` transitions and their row-conditional
probabilities.

This is the sequence-feature sibling of the per-user event chains
(q100 ``pivot.group_concat``): where the chain materializes the ordered
sequence, this collapses it into the transition matrix a downstream
model consumes (session-flow features, anomalous-transition detection).

Physical plan: ONE keyed exchange co-locates each key's timeline
(`partitioned_map` sorted by ``(key, ts, order)``); the kernel is a
single shifted compare per partition (pairs never cross a segment
boundary) + one ``np.add.at`` into a (types × types) matrix — the
partition reduces to ≤ |types|² partial rows.  A second, tiny exchange
(grouped on ``from_type``) sums partials; at 100 TB the second shuffle
moves O(partitions × |types|²) rows, never data.

Probability exactness: ``p = double(cnt) / double(from_total)`` — two
exact-int casts + one IEEE division, replayed in SQL as
``CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY from_type)
AS DOUBLE)`` bit-identically.

Pairs with a NULL type on either side are dropped (SQL ``WHERE``
parity); a NULL key forms one group like every keyed stage here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import segments as seg
from .partition import partitioned_map
from .window import _key_codes_dic


def event_transition_counts(ds, *, key_col: str, ts_col: str,
                            order_col: str, type_col: str,
                            prob_col: str = "p",
                            num_partitions: int = 16):
    """Global transition matrix over per-key consecutive event pairs.

    Returns one row per observed ``(from_type, to_type)``:
    ``(from_type, to_type, cnt:int64, p:float64)`` where ``p`` is the
    transition probability conditional on ``from_type``.
    """

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"from_type": pa.array([], pa.string()),
                          "to_type": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if t.num_rows < 2 or key_col not in t.column_names:
            return empty
        kcodes, _ = _key_codes_dic(t[key_col])
        td = pc.dictionary_encode(t[type_col].combine_chunks())
        tcodes = td.indices.to_numpy(zero_copy_only=False)
        valid = ~np.isnan(tcodes) if tcodes.dtype.kind == "f" else \
            np.ones(len(tcodes), bool)
        tcodes = np.where(valid, tcodes, -1).astype(np.int64)
        _, _, is_start = seg.segment_ids(kcodes)
        # pair (i, i+1) counts iff i+1 is not a new segment and both
        # types are non-null
        pair_ok = (~is_start[1:]) & (tcodes[:-1] >= 0) & (tcodes[1:] >= 0)
        if not pair_ok.any():
            return empty
        f, to = tcodes[:-1][pair_ok], tcodes[1:][pair_ok]
        k = len(td.dictionary)
        mat = np.zeros(k * k, np.int64)
        np.add.at(mat, f * k + to, 1)
        nz = np.flatnonzero(mat)
        return pa.table({
            "from_type": td.dictionary.take(pa.array(nz // k)),
            "to_type": td.dictionary.take(pa.array(nz % k)),
            "cnt": pa.array(mat[nz]),
        })

    partials = partitioned_map(ds, kernel, key=key_col,
                               sort_keys=[key_col, ts_col, order_col],
                               num_partitions=num_partitions,
                               strategy="tasks")

    def finalize(t: pa.Table) -> pa.Table:
        td = pc.dictionary_encode(t["to_type"].combine_chunks())
        codes = td.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnts = t["cnt"].to_numpy(zero_copy_only=False)
        sums = np.zeros(len(td.dictionary), np.int64)
        np.add.at(sums, codes, cnts)
        total = int(sums.sum())
        p = sums.astype(np.float64) / float(total)
        return pa.table({
            "from_type": pa.array([t["from_type"][0].as_py()] * len(sums),
                                  pa.string()),
            "to_type": td.dictionary,
            "cnt": pa.array(sums),
            prob_col: pa.array(p, pa.float64()),
        })

    # second exchange: O(partitions × |types|²) partial rows
    return partials.groupby("from_type").map_groups(
        finalize, batch_format="pyarrow")
