"""Host-side text utilities: mappers, alpha schedules, word indices —
checked against the reference implementation as an oracle when available."""
import os
import sys

import numpy as np
import pytest

from pnpinversion_tpu.utils.text import (
    get_equalizer,
    get_refinement_mapper,
    get_replacement_mapper,
    get_time_words_attention_alpha,
    get_word_inds,
    slerp_tensor,
)
from pnpinversion_tpu.utils.tokenizer import SimpleWordTokenizer

REF = "/root/reference"
HAVE_REF = os.path.isdir(REF)


@pytest.fixture()
def tok():
    return SimpleWordTokenizer()


def test_word_inds(tok):
    text = "a cat sitting on a mat"
    inds = get_word_inds(text, "cat", tok)
    assert list(inds) == [2]
    inds = get_word_inds(text, "a", tok)
    assert list(inds) == [1, 5]
    inds = get_word_inds(text, 3, tok)
    assert list(inds) == [4]


def test_refinement_mapper_identity(tok):
    m, a = get_refinement_mapper(["a cat on a mat", "a cat on a mat"], tok)
    # identical prompts -> identity mapping over the real tokens, alpha 1
    n_tok = len(tok.encode("a cat on a mat"))
    assert (m[0, :n_tok] == np.arange(n_tok)).all()
    assert (a[0, :n_tok] == 1).all()


def test_refinement_mapper_insertion(tok):
    m, a = get_refinement_mapper(["a cat on a mat", "a fluffy cat on a mat"], tok)
    # 'fluffy' (token idx 2 in target) has no source counterpart -> alpha 0
    assert a[0, 2] == 0
    # 'cat' moved from idx 2 (src) to idx 3 (tgt)
    assert m[0, 3] == 2


def test_replacement_mapper(tok):
    m = get_replacement_mapper(["a cat on a mat", "a dog on a mat"], tok)
    assert m.shape == (1, 77, 77)
    # token 2 (cat->dog) maps src idx 2 to tgt idx 2
    assert m[0, 2, 2] == 1
    # all other positions identity
    assert m[0, 1, 1] == 1 and m[0, 3, 3] == 1
    col_sums = m[0].sum(axis=0)
    assert np.all(col_sums > 0)


def test_time_words_alpha(tok):
    prompts = ["a cat on a mat", "a dog on a mat"]
    alpha = get_time_words_attention_alpha(prompts, 50, 0.4, tok)
    assert alpha.shape == (51, 1, 1, 1, 77)
    assert alpha[:20].min() == 1  # first 40% of steps replace
    assert alpha[20:].max() == 0


def test_equalizer(tok):
    eq = get_equalizer("a cat on a mat", ("cat",), (3.0,), tok)
    assert eq.shape == (1, 77)
    assert eq[0, 2] == 3.0
    assert eq[0, 1] == 1.0


def test_slerp_endpoint():
    rng = np.random.RandomState(0)
    a = rng.randn(1, 8, 4).astype(np.float32)
    b = rng.randn(1, 8, 4).astype(np.float32)
    np.testing.assert_allclose(slerp_tensor(0.0, a, b), a, atol=1e-5)
    np.testing.assert_allclose(slerp_tensor(1.0, a, b), b, atol=1e-5)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")
def test_mappers_match_reference_oracle(tok):
    """Run the reference seq_aligner (torch) on the same tokenizer and compare."""
    sys.path.insert(0, REF)
    try:
        from models.p2p import seq_aligner as ref_aligner
    finally:
        sys.path.remove(REF)

    pairs = [
        ("a cat on a mat", "a dog on a mat"),
        ("a cat on a mat", "a fluffy cat on a mat"),
        ("photo of a red car in town", "painting of a red car in town at night"),
    ]
    for src, tgt in pairs:
        ref_m, ref_a = ref_aligner.get_refinement_mapper([src, tgt], tok)
        m, a = get_refinement_mapper([src, tgt], tok)
        np.testing.assert_array_equal(m, ref_m.numpy())
        np.testing.assert_array_equal(a, ref_a.numpy())

    ref_rm = ref_aligner.get_replacement_mapper(["a cat on a mat", "a dog on a mat"], tok)
    rm = get_replacement_mapper(["a cat on a mat", "a dog on a mat"], tok)
    np.testing.assert_allclose(rm, ref_rm.numpy(), atol=1e-6)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")
def test_alpha_schedule_matches_reference_oracle(tok):
    sys.path.insert(0, REF)
    try:
        from utils import utils as ref_utils
    finally:
        sys.path.remove(REF)
    prompts = ["a cat on a mat", "a dog on a mat"]
    ref = ref_utils.get_time_words_attention_alpha(prompts, 50, 0.4, tok).numpy()
    ours = get_time_words_attention_alpha(prompts, 50, 0.4, tok)
    np.testing.assert_array_equal(ours, ref)
