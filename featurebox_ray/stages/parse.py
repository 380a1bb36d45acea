"""Composition-string parsing — transcript analog of the reference's
``namespilt`` (data/namespilt.py): the reference parses chemical formula
strings ("Fe2O3", "0.9Ti0.1Al") into per-element counts plus a DENSE
expansion over the element vocabulary with an "Abandon" bucket for
unknown symbols.

Here the strings are tool/event composition summaries
(``"click3error12view5"`` — name+count components, concatenated), parsed
into per-name counts and expanded over a caller vocabulary with an
``other`` bucket.  Grammar: ``name`` = ``[A-Za-z_]+``, ``count`` =
optional ``\\d+(\\.\\d+)?`` (missing count = 1, like a bare element
symbol); repeated names accumulate (the reference's ``Ele.__add__``).

Stage shape: stateless ``map_batches`` with the compiled regex cached per
worker; the per-row ``findall`` IS the parse (strings are tiny), dense
expansion is a numpy scatter.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence

import numpy as np
import pyarrow as pa

# unambiguous grammar: names glued to counts ("click3error12"); a name
# ends where digits begin, a missing count means 1
_NAME_COUNT = re.compile(r"([A-Za-z_]+)(\d+(?:\.\d+)?)?")


def parse_composition(s: str) -> Dict[str, float]:
    """One composition string -> accumulated {name: count} (count
    defaults to 1, repeats accumulate — reference Ele.__add__)."""
    out: Dict[str, float] = {}
    for name, num in _NAME_COUNT.findall(s):
        if not name:
            continue
        out[name] = out.get(name, 0.0) + (float(num) if num else 1.0)
    return out


class CompositionExpander:
    """map_batches stage: parse ``col`` and append one dense count column
    per vocab entry (``{prefix}{name}``) plus ``{prefix}other`` summing
    unknown names (the reference's Abandon bucket counts presence, ours
    keeps magnitude)."""

    def __init__(self, col: str, vocab: Sequence[str],
                 prefix: str = "comp_"):
        self.col = col
        self.vocab = list(vocab)
        self.index = {n: i for i, n in enumerate(self.vocab)}
        self.prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: List[str] = batch[self.col].to_pylist()
        n = len(rows)
        dense = np.zeros((n, len(self.vocab)), np.float64)
        other = np.zeros(n, np.float64)
        for i, s in enumerate(rows):
            if not s:
                continue
            for name, v in parse_composition(s).items():
                j = self.index.get(name)
                if j is None:
                    other[i] += v
                else:
                    dense[i, j] = v
        out = batch
        for j, name in enumerate(self.vocab):
            out = out.append_column(f"{self.prefix}{name}",
                                    pa.array(dense[:, j]))
        return out.append_column(f"{self.prefix}other", pa.array(other))


def expand_composition(ds, *, col: str, vocab: Sequence[str],
                       prefix: str = "comp_", batch_size: int = 8192):
    return ds.map_batches(
        CompositionExpander,
        fn_constructor_kwargs={"col": col, "vocab": vocab, "prefix": prefix},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=(1, 8))
