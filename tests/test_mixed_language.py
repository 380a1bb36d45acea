"""Mixed-language audit (stages/text.py:mixed_language_fn) — planted
code-switch detection; consistency with TextFeaturizer lang-ID on
monolingual docs."""

import pyarrow as pa
import ray

from featurebox_ray.stages.text import mixed_language_fn

EN = ("the cat sat on the mat and it was the best of the day "
      "for it is that and this are with as by an be")
DE = ("der hund und die katze das ist nicht mit ein eine zu den "
      "von für auf im des und der die das ist")


def test_mixed_language_detects_planted_switch():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            EN + " " + EN,          # en | en  -> not mixed
            EN + " " + DE,          # en | de  -> mixed
            DE + " " + DE,          # de | de  -> not mixed
            "zzz qqq xxx yyy",      # no stopwords -> und | und
        ]),
    })
    got = (ray.data.from_arrow(t)
           .map_batches(mixed_language_fn, batch_format="pyarrow",
                        zero_copy_batch=True)
           .to_pandas().sort_values("doc_id")
           .reset_index(drop=True))
    assert got.lang_head.tolist() == ["en", "en", "de", "und"]
    assert got.lang_tail.tolist() == ["en", "de", "de", "und"]
    assert got.mixed.tolist() == [False, True, False, False]


def test_mixed_language_null_and_empty():
    t = pa.table({
        "doc_id": pa.array([1, None, 3], pa.int64()),
        "text": pa.array(["", EN, None]),
    })
    got = (ray.data.from_arrow(t)
           .map_batches(mixed_language_fn, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas())
    # null id and null text drop; empty text is und/und, not mixed
    assert got.doc_id.tolist() == [1]
    assert got.lang_head.tolist() == ["und"]
    assert not got.mixed.any()
