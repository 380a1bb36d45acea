"""Source/sink conveniences — the reference's ``Call`` directory reader
(featurebox/tools/imports.py:32-107, lazy per-file attributes) and
``Store`` writer (tools/exports.py:38-118) re-expressed over Ray Data.

``Catalog(dir)`` binds every table file under a directory as a lazy
attribute returning a Dataset (parquet/csv; others raise), with column
pruning pushed to the read.  ``Store`` is replaced by
``write_partitioned`` (collision-free, resumable layout) in
``state/checkpoint.py``; the thin ``write_table`` here covers the simple
case.
"""

from __future__ import annotations

import os
from typing import List, Optional

_READERS = {
    ".parquet": "read_parquet",
    ".csv": "read_csv",
}


class Catalog:
    """Lazy table catalog over a directory: ``Catalog(d).lineitem`` →
    Dataset for ``d/lineitem.parquet`` (or ``.csv``)."""

    def __init__(self, root: str):
        self._root = root
        self._tables: dict = {}
        for f in sorted(os.listdir(root)):
            base, ext = os.path.splitext(f)
            if ext in _READERS and base not in self._tables:
                self._tables[base] = os.path.join(root, f)
            elif os.path.isdir(os.path.join(root, f)):
                # directory of fragments (e.g. transcripts/shard-*.parquet)
                self._tables.setdefault(f, os.path.join(root, f))

    @property
    def tables(self) -> List[str]:
        return sorted(self._tables)

    def read(self, name: str, columns: Optional[List[str]] = None, **kw):
        import ray

        path = self._tables[name]
        if os.path.isdir(path):
            return ray.data.read_parquet(path, columns=columns, **kw)
        ext = os.path.splitext(path)[1]
        reader = getattr(ray.data, _READERS[ext])
        if ext == ".parquet":
            return reader(path, columns=columns, **kw)
        ds = reader(path, **kw)
        return ds.select_columns(columns) if columns else ds

    def __getattr__(self, name: str):
        if name.startswith("_") or name not in self.__dict__.get("_tables", {}):
            raise AttributeError(name)
        return self.read(name)


def write_table(ds, path: str, *, fmt: str = "parquet") -> None:
    if fmt == "parquet":
        ds.write_parquet(path)
    elif fmt == "csv":
        ds.write_csv(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
