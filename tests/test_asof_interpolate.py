"""asof_interpolate (stages/asof.py) — hand-checked bracketing/hit/
out-of-span cases; ts-tie last-write-wins; serial replay fuzz;
partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from featurebox_ray.stages.asof import asof_interpolate


def _tables(lrows, rrows):
    lt = pa.table({"k": pa.array([r[0] for r in lrows], pa.string()),
                   "ts": pa.array([r[1] for r in lrows], pa.int64()),
                   "lid": pa.array([r[2] for r in lrows],
                                   pa.int64())})
    rt = pa.table({"k": pa.array([r[0] for r in rrows], pa.string()),
                   "ts": pa.array([r[1] for r in rrows], pa.int64()),
                   "rid": pa.array([r[2] for r in rrows],
                                   pa.int64()),
                   "v": pa.array([r[3] for r in rrows],
                                 pa.float64())})
    return lt, rt


def _run(lt, rt, parts=1) -> pd.DataFrame:
    lds = ray.data.from_arrow(lt)
    rds = ray.data.from_arrow(rt)
    if parts > 1:
        lds = lds.repartition(parts)
        rds = rds.repartition(parts)
    out = asof_interpolate(lds, rds, key="k", ts_col="ts",
                           left_id="lid", right_id="rid",
                           value_col="v", num_partitions=4)
    return (out.to_pandas().sort_values("lid")
            .reset_index(drop=True))


def test_bracket_hit_and_span():
    lrows = [("a", 5, 1), ("a", 10, 2), ("a", 15, 3), ("a", 25, 4),
             ("b", 5, 5)]
    rrows = [("a", 10, 100, 1.0), ("a", 20, 101, 3.0)]
    df = _run(*_tables(lrows, rrows))
    got = dict(zip(df.lid, df.interp))
    assert np.isnan(got[1])            # before span
    assert got[2] == 1.0               # exact hit
    assert got[3] == 1.0 + 2.0 * 0.5   # midpoint
    assert np.isnan(got[4])            # after span
    assert np.isnan(got[5])            # key with no right rows


def test_right_ts_tie_last_write_wins():
    lrows = [("a", 10, 1)]
    rrows = [("a", 10, 100, 1.0), ("a", 10, 101, 9.0)]
    df = _run(*_tables(lrows, rrows))
    assert df.interp.iloc[0] == 9.0    # max right_id wins


def test_fuzz_vs_serial_partition_invariant():
    rng = np.random.default_rng(55)
    lrows, rrows = [], []
    lid = rid = 0
    for _ in range(800):
        k = f"u{rng.integers(6)}"
        if rng.random() < 0.5:
            lrows.append((k, int(rng.integers(0, 1000)), lid))
            lid += 1
        else:
            rrows.append((k, int(rng.integers(0, 1000)), rid + 1000,
                          float(np.round(rng.normal(0, 5), 2))))
            rid += 1

    def serial():
        per = {}
        for k, ts, i, v in rrows:
            per.setdefault(k, {})[ts] = max(
                per.get(k, {}).get(ts, (None, None)),
                (i, v)) if ts in per.get(k, {}) else (i, v)
        # last-write-wins by right id
        coll = {}
        for k, ts, i, v in sorted(rrows, key=lambda r: (r[1], r[2])):
            coll.setdefault(k, {})[ts] = v
        exp = {}
        for k, ts, i in lrows:
            d = coll.get(k)
            if not d:
                exp[i] = None
                continue
            tss = sorted(d)
            import bisect

            j = bisect.bisect_right(tss, ts) - 1
            if j < 0 or ts > tss[-1]:
                exp[i] = None
            elif tss[j] == ts:
                exp[i] = d[tss[j]]
            else:
                t0, t1 = tss[j], tss[j + 1]
                v0, v1 = d[t0], d[t1]
                exp[i] = v0 + (v1 - v0) * (
                    np.float64(ts - t0) / np.float64(t1 - t0))
        return exp

    exp = serial()
    lt, rt = _tables(lrows, rrows)
    prev = None
    for parts in (1, 5):
        df = _run(lt, rt, parts)
        got = {int(r.lid): (None if pd.isna(r.interp)
                            else float(r.interp))
               for r in df.itertuples()}
        assert got == exp
        if prev is not None:
            pd.testing.assert_frame_equal(df, prev, check_exact=True)
        prev = df
