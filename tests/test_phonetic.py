"""Simplified Soundex blocking keys (stages/phonetic.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.phonetic import add_soundex_key, soundex_key


def test_soundex_known_values():
    names = pa.array(["Robert", "Rupert", "Tupper", "Ashcraft",
                      "Tymczak", "lee", "L", "123", "", None,
                      "  O'Brien  "])
    got = soundex_key(names).to_pylist()
    assert got[0] == got[1] == "R163"  # the classic pair
    assert got[2] == "T160"
    # simplified variant: no H/W-separated collapse, so Ashcraft is
    # A226 (classic Soundex would give A261) — the documented delta
    assert got[3] == "A226"
    assert got[5] == "L000"
    assert got[6] == "L000"
    assert got[7] is None and got[8] is None and got[9] is None
    assert got[10] == "O165"


def test_soundex_matches_duckdb_chain():
    rng = np.random.default_rng(4)
    letters = list("abcdefghijklmnopqrstuvwxyz '#-")
    names = ["".join(rng.choice(letters, size=rng.integers(0, 14)))
             for _ in range(500)] + [None]
    t = pa.table({"id": pa.array(range(501), pa.int64()),
                  "nm_raw": pa.array(names, pa.string())})
    from featurebox_ray.stages.phonetic import _CLASSES

    expr = "nm"
    for pat, rep in _CLASSES:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    for d in "0123456":
        expr = f"regexp_replace({expr}, '{d}+', '{d}', 'g')"
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(f"""
        WITH s AS (SELECT id, upper(regexp_replace(coalesce(nm_raw,''),
                     '[^A-Za-z]', '', 'g')) AS nm FROM t),
        m AS (SELECT id, nm, {expr} AS code FROM s)
        SELECT CASE WHEN nm = '' THEN NULL
                    ELSE substr(nm, 1, 1)
                         || substr(replace(substr(code, 2), '0', '')
                                   || '000', 1, 3) END AS k
        FROM m ORDER BY id
    """).fetchall()
    got = (add_soundex_key(ray.data.from_arrow(t).repartition(3),
                           name_col="nm_raw")
           .to_pandas().sort_values("id")["soundex"].tolist())
    assert got == [w[0] for w in want]
