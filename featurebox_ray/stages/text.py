"""Text-analysis operators over document tables — language ID, quality
scoring, token counting, fingerprinting.  All stateless vectorized
``map_batches`` stages (compiled regexes / constant tables built once per
actor via callable classes where state exists).

No reference analog (featurebox is numeric); these are the training-data
operators the engine adds for 100 TB corpora (task brief).
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# tiny public stopword profiles for the n-gram/stopword language heuristic
_LANG_STOPWORDS: Dict[str, set] = {
    "en": {"the", "and", "of", "to", "in", "a", "is", "that", "for", "it",
           "on", "with", "as", "was", "at", "by", "an", "be", "this", "are"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine",
           "zu", "den", "von", "für", "auf", "im", "des"},
    "fr": {"le", "la", "les", "et", "est", "pas", "des", "un", "une", "du",
           "que", "qui", "dans", "pour", "sur", "avec"},
    "es": {"el", "la", "los", "las", "y", "es", "no", "con", "un", "una",
           "de", "que", "en", "por", "para"},
}

_BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
_PUNCT = re.compile(r"[^\w\s]")


class TextFeaturizer:
    """Actor-pool stage: language-ID + quality metrics + token counts +
    64-bit fingerprint per document, appended as columns."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = list(_LANG_STOPWORDS)
        self.stop = _LANG_STOPWORDS
        self.bpe = _BPE_ISH
        self.punct = _PUNCT

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts: List[str] = batch[self.text_col].to_pylist()
        n = len(texts)
        n_chars = np.empty(n, np.int64)
        n_ws_tokens = np.empty(n, np.int64)
        n_bpe_tokens = np.empty(n, np.int64)
        mean_tok_len = np.empty(n, np.float64)
        stopword_ratio = np.empty(n, np.float64)
        punct_ratio = np.empty(n, np.float64)
        upper_ratio = np.empty(n, np.float64)
        quality = np.empty(n, np.float64)
        lang = np.empty(n, object)
        fp = np.empty(n, np.uint64)
        for i, t in enumerate(texts):
            toks = t.split()
            n_chars[i] = len(t)
            n_ws_tokens[i] = len(toks)
            n_bpe_tokens[i] = len(self.bpe.findall(t))
            mean_tok_len[i] = (
                sum(len(x) for x in toks) / len(toks) if toks else 0.0
            )
            lower = [x.lower() for x in toks]
            best, best_score = "und", 0.0
            for lg in self.langs:
                sw = self.stop[lg]
                score = sum(1 for x in lower if x in sw) / max(1, len(lower))
                if score > best_score:
                    best, best_score = lg, score
            lang[i] = best if best_score > 0.05 else "und"
            stopword_ratio[i] = best_score
            n_punct = len(self.punct.findall(t))
            punct_ratio[i] = n_punct / max(1, len(t))
            n_upper = sum(1 for ch in t if ch.isupper())
            upper_ratio[i] = n_upper / max(1, len(t))
            # simple bounded quality score: long enough, word-like tokens,
            # not punctuation-soup, not shouting
            quality[i] = (
                min(1.0, len(toks) / 20.0)
                * (1.0 - min(1.0, punct_ratio[i] * 4))
                * (1.0 - min(1.0, upper_ratio[i] * 2))
            )
            fp[i] = self._fingerprint(toks)
        out = batch
        for name, arr, typ in [
            ("ta_n_chars", n_chars, pa.int64()),
            ("ta_n_tokens", n_ws_tokens, pa.int64()),
            ("ta_n_bpe_tokens", n_bpe_tokens, pa.int64()),
            ("ta_mean_tok_len", mean_tok_len, pa.float64()),
            ("ta_stopword_ratio", stopword_ratio, pa.float64()),
            ("ta_punct_ratio", punct_ratio, pa.float64()),
            ("ta_upper_ratio", upper_ratio, pa.float64()),
            ("ta_quality", quality, pa.float64()),
        ]:
            out = out.append_column(name, pa.array(arr, typ))
        out = out.append_column("ta_lang", pa.array(list(lang), pa.string()))
        out = out.append_column("ta_fingerprint", pa.array(fp, pa.uint64()))
        return out

    @staticmethod
    def _fingerprint(toks: List[str], w: int = 5) -> int:
        """Winnowing-style document fingerprint: min 64-bit hash over rolling
        word w-grams (deterministic; equal for token-identical docs)."""
        if not toks:
            return 0
        grams = [" ".join(toks[i:i + w]) for i in range(max(1, len(toks) - w + 1))]
        return min(
            int.from_bytes(hashlib.sha1(g.encode()).digest()[:8], "little")
            for g in grams
        )


def add_text_features(ds, *, text_col: str = "text", batch_size: int = 4096,
                      concurrency=(2, 8)):
    return ds.map_batches(
        TextFeaturizer,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


_TF_CACHE: dict = {}


def text_features_fn(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Stateless-task variant of :func:`add_text_features`: the featurizer
    is cached per worker process (module global), so no actor slot is
    reserved — important at small CPU counts where min-1 actor pools would
    pin scarce slots and stall the pipeline."""
    tf = _TF_CACHE.get(text_col)
    if tf is None:
        tf = _TF_CACHE[text_col] = TextFeaturizer(text_col)
    return tf(batch)
