"""Multimodal stage plumbing: schema contract, actor-pool decode
determinism, frame sampling layout (decode itself is a documented stub)."""

import numpy as np
import pytest

import ray.data as rd

from graph_computing_go_ray.stages.multimodal import (
    FEAT_DIM,
    decode_features,
    generate_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("media") / "media.parquet")
    generate_media(p, n=48)
    return rd.read_parquet(p)


def test_decode_schema_and_determinism(media):
    out = decode_features(media, concurrency=(1, 2), batch_size=16)
    df = out.to_pandas().sort_values("media_id")
    assert len(df) == 48
    feats = np.stack(df["feat"].to_numpy())
    assert feats.shape == (48, FEAT_DIM)
    assert feats.dtype == np.float32
    # deterministic across a second actor-pool run
    df2 = decode_features(media, concurrency=(1, 2), batch_size=16).to_pandas()
    f2 = np.stack(df2.sort_values("media_id")["feat"].to_numpy())
    np.testing.assert_array_equal(feats, f2)


def test_frame_sampling(media):
    out = sample_frames(media, every_k=5).to_pandas()
    assert set(out.columns) == {"media_id", "frame_idx", "payload"}
    assert (out["frame_idx"] % 5 == 0).all()
    # only video rows produce frames (16 of 48)
    assert out["media_id"].nunique() == 16
    assert out["payload"].map(len).max() <= 256
