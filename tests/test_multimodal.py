"""Multimodal plumbing: schema, actor-pool stages, binary round-trip."""

import pyarrow as pa

import ray.data as rd

from pagerank_ray.pipelines.multimodal import (AudioFrameSampler,
                                               ImageResizer, MEDIA_SCHEMA,
                                               MediaFeaturizer,
                                               featurize_media,
                                               synth_media_table)


def test_media_table_schema():
    t = synth_media_table(n=16)
    assert t.schema.equals(MEDIA_SCHEMA)


def test_featurizer_actor_pool():
    t = synth_media_table(n=16)
    out = featurize_media(t, concurrency=2, batch_size=4).take_all()
    assert len(out) == 16
    for r in out:
        assert len(r["feature"]) == MediaFeaturizer.FEATURE_DIM
        assert r["payload_bytes"] > 0
    # deterministic: same payload -> same features
    again = featurize_media(synth_media_table(n=16),
                            concurrency=2, batch_size=4).take_all()
    a = {r["media_id"]: list(r["feature"]) for r in out}
    b = {r["media_id"]: list(r["feature"]) for r in again}
    assert a == b


def test_image_resizer():
    t = synth_media_table(n=10)
    out = rd.from_arrow(t).map_batches(
        ImageResizer, fn_constructor_args=(32,), batch_format="pyarrow",
        batch_size=4, concurrency=2).take_all()
    for r in out:
        if r["kind"] == "image":
            assert r["width"] == 32 and r["height"] == 32
        else:
            assert r["width"] == 0


def test_audio_frame_sampler():
    t = synth_media_table(n=10)
    out = rd.from_arrow(t).map_batches(
        AudioFrameSampler, batch_format="pyarrow", batch_size=4,
        concurrency=2).take_all()
    audio_ids = {r["media_id"] for r in t.to_pylist()
                 if r["kind"] == "audio"}
    got_ids = {r["media_id"] for r in out}
    assert got_ids == audio_ids
    per = {}
    for r in out:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
        assert isinstance(r["frame"], bytes) and len(r["frame"]) > 0
    assert all(sorted(v) == [0, 1, 2, 3] for v in per.values())
