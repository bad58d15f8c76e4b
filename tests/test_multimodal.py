"""Multimodal stage tests: media span extraction + featurizer plumbing."""

import numpy as np
import pytest
import ray.data as rd

from entity_matching_datasets_ray.stages.multimodal import (
    MEDIA_FEATURE_DIM,
    MediaFeaturizer,
    extract_media_refs,
    featurize_media,
)
from entity_matching_datasets_ray.synth import synth_docs_table


@pytest.fixture(scope="module")
def docs():
    return rd.from_arrow(synth_docs_table(120))


def test_extract_media_refs(docs):
    refs = extract_media_refs(docs).to_pandas()
    assert len(refs) > 0
    assert (refs.kind == "image").all()
    assert refs.media_ref.str.startswith("synthetic://").all()
    # offsets preserved from the original span sequence
    assert (refs.span_offset >= 0).all()


def test_featurizer_deterministic(docs):
    out1 = featurize_media(docs).to_pandas().sort_values("media_ref").reset_index(drop=True)
    out2 = featurize_media(docs).to_pandas().sort_values("media_ref").reset_index(drop=True)
    assert len(out1) == len(out2)
    for a, b in zip(out1.media_feature, out2.media_feature):
        assert np.allclose(list(a), list(b))
    assert all(len(list(f)) == MEDIA_FEATURE_DIM for f in out1.media_feature)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        MediaFeaturizer(decoder="real")
    with pytest.raises(ValueError):
        MediaFeaturizer(decoder="bogus")


def test_decode_retry_and_metered_fallback():
    """Per-item semantic retry (A3): a transiently-failing decoder
    succeeds within the retry budget; a permanently-failing ref falls back
    to the zero vector with decode_failures metered, never silent."""
    import numpy as np
    import pyarrow as pa

    from entity_matching_datasets_ray.stages.multimodal import (
        MEDIA_FEATURE_DIM,
        MediaFeaturizer,
    )

    calls = {}

    def flaky(ref):
        calls[ref] = calls.get(ref, 0) + 1
        if ref == "always-bad":
            raise IOError("corrupt")
        if calls[ref] < 2:  # fails first attempt, succeeds on retry
            raise IOError("transient")
        return np.full(MEDIA_FEATURE_DIM, 7.0, dtype=np.float32)

    f = MediaFeaturizer(decoder="real", retries=2, decode_fn=flaky)
    batch = pa.table(
        {"doc_id": ["a", "b"], "media_ref": ["ok-after-retry", "always-bad"]}
    )
    out = f(batch)
    feats = out.column("media_feature").to_pylist()
    assert feats[0][0] == 7.0  # recovered on retry
    assert all(v == 0.0 for v in feats[1])  # fallback zero vector
    assert out.column("decode_failures").to_pylist() == [1, 1]  # metered
    assert calls["always-bad"] == 3  # retries + 1 attempts


def test_media_dedup_pairs_planted():
    """Exact media dedup over planted shared refs: doc i reuses ref
    (i % 4) -> each group's min doc pairs with every other member (star
    emission), groups of size 3 exercised."""
    import pyarrow as pa

    from entity_matching_datasets_ray.schema import DOCS_SCHEMA
    from entity_matching_datasets_ray.stages.multimodal import media_dedup_pairs

    n = 12
    rows = []
    for i in range(n):
        rows.append(
            {
                "doc_id": f"d{i:03d}",
                "dataset": "t",
                "spans": [
                    {"kind": "text", "text": f"name=x{i}", "media_ref": "", "offset": 0},
                    {
                        "kind": "image",
                        "text": "",
                        "media_ref": f"synthetic://img/{i % 4}",
                        "offset": 1,
                    },
                ],
            }
        )
    docs = rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCS_SCHEMA))
    got = media_dedup_pairs(docs, num_partitions=3).to_pandas()
    expected = sorted(
        (f"d{g:03d}", f"d{i:03d}") for g in range(4) for i in range(g + 4, n, 4)
    )
    assert sorted(zip(got.left_id, got.right_id)) == expected


def test_frame_sampler_expansion_and_gates(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from entity_matching_datasets_ray.pipelines.flagship import DOCS_SCHEMA
    from entity_matching_datasets_ray.stages.multimodal import (
        FrameSampler,
        ResizePlanner,
        plan_resize,
        sample_frames,
    )

    rows = [
        {
            "doc_id": f"d{i}",
            "dataset": "t",
            "spans": [
                {"kind": "text", "text": "x", "media_ref": "", "offset": 0},
                {"kind": "video", "text": "", "media_ref": f"synthetic://vid/{i}", "offset": 1},
            ],
        }
        for i in range(8)
    ]
    docs = rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCS_SCHEMA))
    frames = sample_frames(docs).to_pandas()
    # group g=i: 1 + (i % 4) frames each
    assert len(frames) == sum(1 + (i % 4) for i in range(8))
    assert set(frames.columns) == {"doc_id", "media_ref", "frame_idx", "frame_feature"}
    assert all(len(v) == 8 for v in frames["frame_feature"])

    plan = plan_resize(docs, target_h=64).to_pandas()
    assert (plan["out_h"] == 64).all()
    assert (plan["out_w"] == (plan["orig_w"] * 64) // plan["orig_h"]).all()

    with pytest.raises(NotImplementedError):
        FrameSampler(decoder="real")
    with pytest.raises(NotImplementedError):
        ResizePlanner(decoder="real")
