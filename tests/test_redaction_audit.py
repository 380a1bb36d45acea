"""Redaction completeness audit (q301 composition) — planted PII is
fully scrubbed, marker count equals match count, zero residual."""

import pyarrow as pa
import pyarrow.compute as pc
import ray

from featurebox_ray.stages.redact import pattern_redact

PAT = r"\b(ssn|card)\b"


def test_redaction_is_complete_and_counted():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "my ssn is secret and my card too",   # 2 matches
            "nothing sensitive here",             # 0
            "ssn ssn ssn",                        # 3
        ]),
    })
    red = pattern_redact(ray.data.from_arrow(t), pattern=PAT,
                         replacement="[X]")
    out = red.to_pandas()
    assert out.n_redactions.tolist() == [2, 0, 3]
    cleaned = pa.array(out.text)
    # invariants the q301 audit asserts at corpus scale
    residual = pc.sum(pc.count_substring_regex(cleaned, PAT)).as_py()
    markers = pc.sum(pc.count_substring(cleaned, "[X]")).as_py()
    assert residual == 0
    assert markers == 5
    assert (out.text[0]
            == "my [X] is secret and my [X] too")
