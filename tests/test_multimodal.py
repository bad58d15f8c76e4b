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
