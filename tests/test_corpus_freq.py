"""Corpus-frequency familiarity scoring (stages/tfidf.py)."""

import numpy as np
import pyarrow as pa
import ray

from featurebox_ray.stages.tfidf import corpus_freq_score


def _ds(rows, n_parts=3):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    return ray.data.from_arrow(t).repartition(n_parts)


def test_corpus_freq_hand_case():
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "zzz qqq"),          # pure OOV at top_v=3
        (4, ""),                  # zero tokens -> no row
        (5, None),                # null text -> no row
    ]
    # term counts: the=3 sat=2 cat=1 on=1 mat=1 dog=1 zzz=1 qqq=1
    # top_v=3 by (cnt desc, term asc): the(3), sat(2), cat(1)
    got = {r["doc_id"]: r for r in
           corpus_freq_score(_ds(rows), top_v=3).to_pandas()
           .to_dict("records")}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_tokens"] == 6
    assert got[1]["n_invocab"] == 4          # the, cat, sat, the
    assert got[1]["fam_sum"] == 3 + 1 + 2 + 3
    assert got[2]["n_tokens"] == 3 and got[2]["n_invocab"] == 2
    assert got[2]["fam_sum"] == 3 + 2
    assert got[3]["n_invocab"] == 0 and got[3]["fam_sum"] == 0


def test_corpus_freq_matches_duckdb_fuzz():
    import duckdb

    rng = np.random.default_rng(97)
    vocab = [f"w{i:02d}" for i in range(40)]
    rows = [(i, " ".join(rng.choice(vocab, size=int(rng.integers(0, 30)),
                                    p=None)))
            for i in range(80)]
    for parts, v in ((2, 10), (7, 10), (7, 25)):
        got = (corpus_freq_score(_ds(rows, parts), top_v=v,
                                 num_partitions=3)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        docs = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string())})
        con = duckdb.connect()
        con.register("docs", docs)
        want = con.execute(f"""
            WITH tok AS (SELECT doc_id,
                                unnest(regexp_extract_all(text, '\\S+'))
                                    AS term FROM docs),
            cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
            top AS (SELECT term, c FROM cnt ORDER BY c DESC, term
                    LIMIT {v})
            SELECT t.doc_id, count(*) AS n_tokens,
                   count(top.term) AS n_invocab,
                   CAST(coalesce(sum(top.c), 0) AS BIGINT) AS fam_sum
            FROM tok t LEFT JOIN top USING (term)
            GROUP BY t.doc_id ORDER BY t.doc_id
        """).df()
        con.close()
        assert len(got) == len(want)
        for c in ["doc_id", "n_tokens", "n_invocab", "fam_sum"]:
            assert (got[c].to_numpy(np.int64)
                    == want[c].to_numpy(np.int64)).all(), (c, parts, v)
