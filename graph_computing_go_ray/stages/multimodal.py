"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata; decode / feature-extract / resize / frame-sample as
actor-pool map_batches stages.

The decode libraries (PIL/ffmpeg/...) are NOT in this container, so the
codec boundary is stubbed: ``DecodeActor`` uses a deterministic fake codec
(payload bytes → seeded feature vector) unless a real decoder import
succeeds. The Ray-side plumbing — schema contract, actor-pool signature,
batch sizing for wide binary rows, output layout — is real and tested
(tests/test_multimodal.py); swapping the stub for a real codec changes one
method.

Schema contract (media table):
    media(media_id:int64, kind:string in {image,audio,video},
          payload:large_binary, meta:string(JSON: width/height/dur/codec))
Stage outputs:
    decode   → (media_id, kind, feat: fixed list<float32>[DIM])
    resize   → (media_id, kind, payload: large_binary)   # re-encoded
    sample   → (media_id, frame_idx:int32, payload: large_binary)
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

from ray.data import Dataset

FEAT_DIM = 32


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec: bytes → FEAT_DIM float32.
    Stable across processes (blake2b-seeded)."""
    h = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "little"))
    return rng.normal(size=FEAT_DIM).astype(np.float32)


class DecodeActor:
    """Actor-pool stage: codec state initialized once per actor (ST1
    pattern). Real decoders would be loaded here behind the import-try."""

    def __init__(self):
        try:  # real decoder if ever available in the image
            from PIL import Image

            self._pil_image = Image
        except ImportError:
            self._pil_image = None

    def decode_one(self, payload: bytes, kind: str, meta: dict) -> np.ndarray:
        if self._pil_image is not None and kind == "image":
            # real path: decode -> grayscale -> resize 8x4 -> normalized
            # pixels (= FEAT_DIM floats). Payloads that are not a real
            # encoded image (e.g. the sandbox's deterministic text-byte
            # fixture) fall back to the stub, so outputs stay stable
            # wherever PIL happens to exist. pytest.importorskip-gated
            # test: tests/test_multimodal.py::test_real_codec_path_pil
            try:
                from io import BytesIO

                img = self._pil_image.open(BytesIO(payload))
                img = img.convert("L").resize((8, FEAT_DIM // 8))
                px = np.asarray(img, np.float32).ravel() / 255.0
                if px.shape[0] == FEAT_DIM:
                    return px.astype(np.float32)
            except Exception:
                pass
        return _fake_decode(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload, kind, meta in zip(
            batch["payload"].to_pylist(), batch["kind"].to_pylist(),
            batch["meta"].to_pylist(),
        ):
            feats.append(self.decode_one(payload, kind, json.loads(meta or "{}")))
        arr = np.stack(feats) if feats else np.zeros((0, FEAT_DIM), np.float32)
        return pa.table(
            {"media_id": batch["media_id"], "kind": batch["kind"],
             "feat": pa.FixedSizeListArray.from_arrays(
                 pa.array(arr.ravel(), pa.float32()), FEAT_DIM)}
        )


class FrameSampleActor:
    """Video → every k-th 'frame' (stub: fixed-size byte windows of the
    payload stand in for decoded frames; real path would seek with ffmpeg)."""

    def __init__(self, every_k: int = 10, frame_bytes: int = 256):
        self.every_k = every_k
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(), batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            n_frames = max(1, len(payload) // self.frame_bytes)
            for fi in range(0, n_frames, self.every_k):
                ids.append(mid)
                idxs.append(fi)
                frames.append(
                    payload[fi * self.frame_bytes : (fi + 1) * self.frame_bytes]
                )
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "frame_idx": pa.array(idxs, pa.int32()),
             "payload": pa.array(frames, pa.large_binary())}
        )


def decode_features(
    media: Dataset, concurrency=(1, 4), batch_size: int = 64
) -> Dataset:
    """batch_size is SMALL because payload rows are wide binary — batch ×
    concurrency must fit the actor heap (ray_guide memory note)."""
    return media.map_batches(
        DecodeActor, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(
    media: Dataset, every_k: int = 10, concurrency=(1, 4), batch_size: int = 16
) -> Dataset:
    return media.map_batches(
        FrameSampleActor, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"every_k": every_k},
    )


def media_table(sf_dir: str) -> Dataset:
    """Deterministic media table derived from the driver's documents table
    (no external data): media_id = doc_id, kind cycles image/audio/video by
    doc_id, payload = the document's utf-8 text bytes (byte-identical per
    doc across runs/processes), meta = JSON with the char count. The binary
    column is OPAQUE to every stage that follows — exactly the contract a
    real crawl-side media table would have."""
    import pyarrow.compute as pc

    from ..sources.readers import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    kinds = np.array(["image", "audio", "video"])

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payload = pc.cast(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray) else t["text"],
            pa.large_binary(),
        )
        nchars = pc.binary_length(payload).to_numpy(zero_copy_only=False)
        metas = [json.dumps({"n": int(c)}, separators=(",", ":")) for c in nchars]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds[ids % 3]),
            "payload": payload,
            "meta": pa.array(metas),
        })

    return docs.map_batches(to_media, batch_format="pyarrow")


def media_features(sf_dir: str) -> Dataset:
    """Driver query: decode the media table through the actor-pool codec
    stage and emit per-item feature summaries
    (media_id, kind, feat_mean, feat_l2) — the stub codec is deterministic,
    so the exact-replica oracle lives in tests/test_multimodal.py; the
    driver records a rows/schema check (no SQL oracle for a codec)."""
    feats = decode_features(media_table(sf_dir))

    def summarize(t: pa.Table) -> pa.Table:
        f = t["feat"]
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        arr = f.values.to_numpy(zero_copy_only=False).reshape(-1, FEAT_DIM)
        arr64 = arr.astype(np.float64)
        return pa.table({
            "media_id": t["media_id"],
            "kind": t["kind"],
            "feat_mean": pa.array(np.round(arr64.mean(axis=1), 6)),
            "feat_l2": pa.array(np.round(np.sqrt((arr64 ** 2).sum(axis=1)), 6)),
        })

    return feats.map_batches(summarize, batch_format="pyarrow")


def media_frame_stats(sf_dir: str, every_k: int = 4) -> Dataset:
    """Driver query: frame-sample the video rows and count sampled frames
    per media item (media_id, n_frames) — exercises the ragged flat-map
    actor stage end-to-end."""
    frames = sample_frames(media_table(sf_dir), every_k=every_k)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_numpy(zero_copy_only=False)
        u, cnt = np.unique(ids, return_counts=True)
        return pa.table({"media_id": pa.array(u, pa.int64()),
                         "n_frames": pa.array(cnt.astype(np.int64))})

    from ..engine.join import bucket_grouped_sum

    return bucket_grouped_sum(
        frames.map_batches(partial, batch_format="pyarrow"),
        ["media_id"], ["n_frames"],
    )


def generate_media(out_path: str, n: int = 64, seed: int = 42) -> str:
    """Deterministic fake media table for tests/bench."""
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows_kind = [kinds[i % 3] for i in range(n)]
    payloads = [rng.bytes(512 + 256 * (i % 7)) for i in range(n)]
    metas = [json.dumps({"w": 64, "h": 64} if k == "image" else {"dur": 3.2})
             for k in rows_kind]
    t = pa.table(
        {"media_id": pa.array(range(n), pa.int64()),
         "kind": pa.array(rows_kind),
         "payload": pa.array(payloads, pa.large_binary()),
         "meta": pa.array(metas)}
    )
    pq.write_table(t, out_path)
    return out_path
