"""Multimodal (image/audio/video) column plumbing.

Binary payloads are opaque ``binary`` columns with typed metadata columns
(``mm_kind``, ``mm_format``, width/height/duration).  Decode / resize /
frame-sample are actor-pool ``map_batches`` stages with REAL Ray plumbing
(schema, batch sizing, actor signature, output layout) and a STUBBED codec:
the container has no image/audio libraries, so the default codec is a
deterministic fake; installing Pillow/soundfile later means swapping one
callable, not re-architecting.

Batch-size note: payloads dominate memory, so these stages use small
``batch_size`` (payload_bytes × batch_size × concurrency must fit the worker
heap) — the caller passes ``batch_size`` accordingly.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa


def _try_import_pillow():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: interprets the payload bytes
    DIRECTLY as an 8×8×3 pixel block, repeating the payload to fill 192
    bytes.  Marked fake; replace with a real codec when available.  Pure
    byte arithmetic (no RNG) so an independent implementation — the q27
    fixture oracle — can replay the downstream feature math exactly."""
    need = 8 * 8 * 3
    if not payload:
        payload = b"\x00"
    reps = -(-need // len(payload))
    buf = (payload * reps)[:need]
    return np.frombuffer(buf, dtype=np.uint8).reshape(8, 8, 3).copy()


class ImageFeatureExtractor:
    """Actor-pool stage: decode binary image payloads and append per-image
    features (mean/std per channel, entropy proxy).  ``codec=None`` uses
    Pillow when importable, else the deterministic fake (``is_fake`` column
    records which)."""

    def __init__(self, payload_col: str = "payload", codec: Optional[Callable] = None):
        self.payload_col = payload_col
        if codec is not None:
            self.codec, self.fake = codec, codec is fake_decode
        else:
            pil = _try_import_pillow()
            if pil is not None:
                import io

                def real(b: bytes) -> np.ndarray:
                    return np.asarray(pil.open(io.BytesIO(b)).convert("RGB"))

                self.codec, self.fake = real, False
            else:
                self.codec, self.fake = fake_decode, True

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        mean = np.full((n, 3), np.nan)
        std = np.full((n, 3), np.nan)
        ent = np.full(n, np.nan)
        missing = np.zeros(n, bool)
        for i, b in enumerate(payloads):
            if b is None:
                # a null payload has no decodable content under ANY codec
                # — emit null features, never fabricate stats from b""
                missing[i] = True
                continue
            img = self.codec(b)
            f = img.reshape(-1, img.shape[-1]).astype(np.float64)
            mean[i] = f.mean(axis=0)
            std[i] = f.std(axis=0)
            hist, _ = np.histogram(f[:, 0], bins=16, range=(0, 256))
            p = hist / max(1, hist.sum())
            ent[i] = -np.sum(p[p > 0] * np.log2(p[p > 0]))
        out = batch
        for c, arr in [("img_mean_r", mean[:, 0]), ("img_mean_g", mean[:, 1]),
                       ("img_mean_b", mean[:, 2]), ("img_std_r", std[:, 0]),
                       ("img_std_g", std[:, 1]), ("img_std_b", std[:, 2]),
                       ("img_entropy", ent)]:
            out = out.append_column(c, pa.array(arr, mask=missing))
        out = out.append_column(
            "img_decoder_is_fake", pa.array(np.full(n, self.fake, dtype=bool))
        )
        return out


def add_image_features(ds, *, payload_col: str = "payload",
                       codec: Optional[Callable] = None,
                       batch_size: int = 64, concurrency=(2, 8), num_cpus=1):
    """Small batches: payload × batch × actors sized to worker heap.
    ``codec`` pins a specific decoder (e.g. ``fake_decode`` for
    fixture-checked runs); default auto-selects Pillow when importable."""
    return ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"payload_col": payload_col, "codec": codec},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def make_fake_media_table(n: int = 64, seed: int = 0) -> pa.Table:
    """Deterministic opaque-binary media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, rng.integers(64, 512), dtype=np.uint8).tobytes()
                for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "mm_kind": pa.array(["image"] * n),
        "mm_format": pa.array(["fake"] * n),
        "payload": pa.array(payloads, pa.binary()),
    })
