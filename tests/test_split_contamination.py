"""Split-contamination composition (q297 callable path) — planted
near-duplicate across splits is detected; clean random splits are
mostly clean."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from featurebox_ray.stages.ann import threshold_similarity_join
from featurebox_ray.stages.sample import knuth_hash


def test_threshold_join_detects_cross_split_neardup():
    rng = np.random.default_rng(297)
    n, d = 600, 16
    x = rng.normal(0, 0.1, (n, d))
    ids = np.arange(n, dtype=np.int64)
    bk = knuth_hash(ids) % 4
    test_sel = np.flatnonzero(bk == 3)
    train_sel = np.flatnonzero(bk != 3)
    # plant: copy one test vector (scaled up so the dot is huge) into
    # the train split
    leak_test = int(test_sel[0])
    leak_train = int(train_sel[0])
    x[leak_test] = np.ones(d)
    x[leak_train] = np.ones(d)
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([r.tolist() for r in x],
                              pa.list_(pa.float32()))})

    def keep_train(b):
        col = b["vec_id"].combine_chunks()
        v = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
        keep = knuth_hash(v.astype(np.int64)) % 4 != 3
        return b.filter(pa.array(keep))

    train = (ray.data.from_arrow(t).repartition(4)
             .map_batches(keep_train, batch_format="pyarrow",
                          zero_copy_batch=True))
    Q = x[test_sel]
    pairs = threshold_similarity_join(
        train, Q, threshold_num=int(0.8 * d * 256 * 256),
        quant_bits=8,
        query_ids=ids[test_sel]).to_pandas()
    assert leak_test in set(pairs.query_id)
    assert leak_train in set(pairs.vec_id)
    # the random background at sigma=0.1 cannot reach 0.8*d
    assert set(pairs.query_id) == {leak_test}
