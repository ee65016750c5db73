"""Compiled greedy decode vs the conventional host loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chambers_tpu.models import Seq2SeqTransformer, greedy_decode

BOS = 1


@pytest.fixture(scope="module")
def model_and_vars():
    module = Seq2SeqTransformer(
        input_vocab_size=16, output_vocab_size=16, embed_dim=32,
        num_heads=2, dim_feedforward=64, num_encoder_layers=2,
        num_decoder_layers=2, dropout_rate=0.0,
    )
    dummy = (jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32))
    variables = module.init(jax.random.PRNGKey(0), dummy)
    return module, variables


def host_loop_decode(module, variables, src, max_len):
    batch = src.shape[0]
    out = np.zeros((batch, max_len), np.int32)
    tgt_in = np.zeros((batch, max_len), np.int32)
    tgt_in[:, 0] = BOS
    for i in range(max_len):
        logits = module.apply(variables, (jnp.asarray(src),
                                          jnp.asarray(tgt_in)),
                              deterministic=True)
        nxt = np.asarray(jnp.argmax(logits[:, i], -1))
        out[:, i] = nxt
        if i + 1 < max_len:
            tgt_in[:, i + 1] = nxt
    return out


def test_matches_host_loop(model_and_vars):
    module, variables = model_and_vars
    src = jnp.asarray(
        np.random.default_rng(5).integers(1, 16, (3, 8)), jnp.int32
    )
    want = host_loop_decode(module, variables, np.asarray(src), max_len=8)
    got = jax.jit(
        lambda v, s: greedy_decode(module, v, s, max_len=8, bos_id=BOS)
    )(variables, src)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_eos_pads_the_tail(model_and_vars):
    module, variables = model_and_vars
    src = jnp.asarray(
        np.random.default_rng(6).integers(1, 16, (4, 8)), jnp.int32
    )
    plain = np.asarray(
        greedy_decode(module, variables, src, max_len=8, bos_id=BOS)
    )
    # pick whatever token the untrained model emits first as the "eos"
    eos = int(plain[0, 0])
    stopped = np.asarray(
        greedy_decode(module, variables, src, max_len=8, bos_id=BOS,
                      eos_id=eos)
    )
    for row_p, row_s in zip(plain, stopped):
        hits = np.nonzero(row_s == eos)[0]
        if hits.size:
            first = hits[0]
            # identical up to and including the first eos, padding after
            np.testing.assert_array_equal(row_s[:first + 1],
                                          row_p[:first + 1])
            assert (row_s[first + 1:] == 0).all()
        else:
            np.testing.assert_array_equal(row_s, row_p)


def test_decode_of_moe_seq2seq_compiles():
    module = Seq2SeqTransformer(
        input_vocab_size=16, output_vocab_size=16, embed_dim=32,
        num_heads=2, dim_feedforward=64, num_encoder_layers=2,
        num_decoder_layers=2, dropout_rate=0.0,
        moe_every_n=2, moe_n_experts=4, moe_n_selected_experts=2,
    )
    dummy = (jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32))
    variables = module.init(jax.random.PRNGKey(0), dummy)
    src = jnp.asarray(
        np.random.default_rng(7).integers(1, 16, (2, 8)), jnp.int32
    )
    out = jax.jit(
        lambda v, s: greedy_decode(module, v, s, max_len=6, bos_id=BOS)
    )(variables, src)
    assert out.shape == (2, 6) and out.dtype == jnp.int32


def test_sample_decode_low_temperature_equals_greedy(model_and_vars):
    from chambers_tpu.models import sample_decode

    module, variables = model_and_vars
    src = jnp.asarray(
        np.random.default_rng(8).integers(1, 16, (3, 8)), jnp.int32
    )
    greedy = greedy_decode(module, variables, src, max_len=8, bos_id=BOS)
    cold = sample_decode(module, variables, src, jax.random.PRNGKey(0),
                         max_len=8, bos_id=BOS, temperature=1e-4)
    np.testing.assert_array_equal(np.asarray(cold), np.asarray(greedy))


def test_sample_decode_deterministic_per_key_and_varies_across_keys(
        model_and_vars):
    from chambers_tpu.models import sample_decode

    module, variables = model_and_vars
    src = jnp.asarray(
        np.random.default_rng(9).integers(1, 16, (4, 8)), jnp.int32
    )
    fn = jax.jit(lambda v, s, k: sample_decode(
        module, v, s, k, max_len=8, bos_id=BOS, temperature=2.0))
    a = np.asarray(fn(variables, src, jax.random.PRNGKey(1)))
    b = np.asarray(fn(variables, src, jax.random.PRNGKey(1)))
    c = np.asarray(fn(variables, src, jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()  # untrained logits ~uniform at T=2: keys differ


def test_sample_decode_rejects_nonpositive_temperature(model_and_vars):
    from chambers_tpu.models import sample_decode

    module, variables = model_and_vars
    src = jnp.zeros((1, 8), jnp.int32)
    with pytest.raises(ValueError, match="temperature"):
        sample_decode(module, variables, src, jax.random.PRNGKey(0),
                      max_len=4, bos_id=BOS, temperature=0.0)


def test_beam_size_1_equals_greedy(model_and_vars):
    from chambers_tpu.models import beam_search_decode

    module, variables = model_and_vars
    src = jnp.asarray(
        np.random.default_rng(10).integers(1, 16, (3, 8)), jnp.int32
    )
    greedy = greedy_decode(module, variables, src, max_len=8, bos_id=BOS)
    beam1 = beam_search_decode(module, variables, src, max_len=8,
                               bos_id=BOS, beam_size=1)
    np.testing.assert_array_equal(np.asarray(beam1), np.asarray(greedy))


def _sequence_logp(module, variables, src, seq, max_len):
    """Teacher-forced sum of log-probs of `seq` under the model."""
    b = src.shape[0]
    tgt = np.zeros((b, max_len), np.int32)
    tgt[:, 0] = BOS
    tgt[:, 1:] = np.asarray(seq)[:, :-1]
    logits = module.apply(variables, [src, jnp.asarray(tgt)])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(
        logp, jnp.asarray(seq)[:, :, None], axis=-1
    )[..., 0]
    return np.asarray(jnp.sum(picked, axis=-1))


def test_beam_search_scores_at_least_greedy(model_and_vars):
    from chambers_tpu.models import beam_search_decode

    module, variables = model_and_vars
    src = jnp.asarray(
        np.random.default_rng(11).integers(1, 16, (4, 8)), jnp.int32
    )
    greedy = greedy_decode(module, variables, src, max_len=8, bos_id=BOS)
    best, scores = jax.jit(
        lambda v, s: beam_search_decode(module, v, s, max_len=8, bos_id=BOS,
                                        beam_size=4, return_scores=True)
    )(variables, src)
    greedy_logp = _sequence_logp(module, variables, src, greedy, 8)
    beam_logp = _sequence_logp(module, variables, src, best, 8)
    # the returned score is the model log-prob of the returned sequence
    np.testing.assert_allclose(np.asarray(scores), beam_logp, rtol=1e-5,
                               atol=1e-5)
    # beam search can never do worse than the greedy path it contains
    assert (beam_logp >= greedy_logp - 1e-5).all()


def test_beam_search_eos_freezes_hypotheses(model_and_vars):
    from chambers_tpu.models import beam_search_decode

    module, variables = model_and_vars
    src = jnp.asarray(
        np.random.default_rng(12).integers(1, 16, (3, 8)), jnp.int32
    )
    plain = np.asarray(beam_search_decode(
        module, variables, src, max_len=8, bos_id=BOS, beam_size=3))
    eos = int(plain[0, 0])
    stopped = np.asarray(beam_search_decode(
        module, variables, src, max_len=8, bos_id=BOS, beam_size=3,
        eos_id=eos))
    for row in stopped:
        hits = np.nonzero(row == eos)[0]
        if hits.size:
            assert (row[hits[0] + 1:] == 0).all()


def test_beam_search_validates_beam_size(model_and_vars):
    from chambers_tpu.models import beam_search_decode

    module, variables = model_and_vars
    with pytest.raises(ValueError, match="beam_size"):
        beam_search_decode(module, variables, jnp.zeros((1, 8), jnp.int32),
                           max_len=4, bos_id=BOS, beam_size=0)


def test_decode_invariant_to_trailing_source_padding(model_and_vars):
    """Appending pad columns to the source must not change the decode:
    the input mask excludes pad keys from encoder self-attention and from
    cross-attention, so real positions see identical context."""
    module, variables = model_and_vars
    src = jnp.asarray(
        np.random.default_rng(13).integers(1, 16, (3, 6)), jnp.int32
    )
    padded = jnp.concatenate(
        [src, jnp.zeros((3, 4), jnp.int32)], axis=1
    )
    a = greedy_decode(module, variables, src, max_len=8, bos_id=BOS)
    b = greedy_decode(module, variables, padded, max_len=8, bos_id=BOS)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# KV-cache path (use_cache): one token per step through cached K/V must
# reproduce the full-recompute loop exactly — tokens for greedy/sample/beam,
# scores to float tolerance (different contraction order).
# ---------------------------------------------------------------------------


def test_cached_greedy_equals_full_recompute(model_and_vars):
    module, variables = model_and_vars
    src = jnp.asarray(
        np.random.default_rng(20).integers(1, 16, (3, 8)), jnp.int32
    )
    full = greedy_decode(module, variables, src, max_len=8, bos_id=BOS,
                         use_cache=False)
    cached = jax.jit(lambda v, s: greedy_decode(
        module, v, s, max_len=8, bos_id=BOS, use_cache=True
    ))(variables, src)
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(full))


def test_cached_greedy_eos_equals_full_recompute(model_and_vars):
    """Pad tokens fed after EOS must stay masked in the cache exactly as the
    full loop's `targets != 0` mask excludes them."""
    module, variables = model_and_vars
    src = jnp.asarray(
        np.random.default_rng(21).integers(1, 16, (4, 8)), jnp.int32
    )
    plain = np.asarray(greedy_decode(module, variables, src, max_len=8,
                                     bos_id=BOS, use_cache=False))
    eos = int(plain[0, 0])
    full = greedy_decode(module, variables, src, max_len=8, bos_id=BOS,
                         eos_id=eos, use_cache=False)
    cached = greedy_decode(module, variables, src, max_len=8, bos_id=BOS,
                           eos_id=eos, use_cache=True)
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(full))


def test_cached_sample_equals_full_recompute(model_and_vars):
    from chambers_tpu.models import sample_decode

    module, variables = model_and_vars
    src = jnp.asarray(
        np.random.default_rng(22).integers(1, 16, (3, 8)), jnp.int32
    )
    key = jax.random.PRNGKey(3)
    full = sample_decode(module, variables, src, key, max_len=8, bos_id=BOS,
                         temperature=1.5, use_cache=False)
    cached = sample_decode(module, variables, src, key, max_len=8,
                           bos_id=BOS, temperature=1.5, use_cache=True)
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(full))


def test_cached_beam_equals_full_recompute(model_and_vars):
    from chambers_tpu.models import beam_search_decode

    module, variables = model_and_vars
    src = jnp.asarray(
        np.random.default_rng(23).integers(1, 16, (3, 8)), jnp.int32
    )
    full, fs = beam_search_decode(module, variables, src, max_len=8,
                                  bos_id=BOS, beam_size=4, eos_id=2,
                                  return_scores=True, use_cache=False)
    cached, cs = jax.jit(lambda v, s: beam_search_decode(
        module, v, s, max_len=8, bos_id=BOS, beam_size=4, eos_id=2,
        return_scores=True, use_cache=True
    ))(variables, src)
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(full))
    np.testing.assert_allclose(np.asarray(cs), np.asarray(fs), atol=1e-5)


def test_use_cache_raises_on_moe_decoder():
    module = Seq2SeqTransformer(
        input_vocab_size=16, output_vocab_size=16, embed_dim=32,
        num_heads=2, dim_feedforward=64, num_encoder_layers=2,
        num_decoder_layers=2, dropout_rate=0.0,
        moe_every_n=2, moe_n_experts=4,
    )
    dummy = (jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32))
    variables = module.init(jax.random.PRNGKey(0), dummy)
    src = jnp.ones((2, 8), jnp.int32)
    with pytest.raises(NotImplementedError, match="use_cache"):
        greedy_decode(module, variables, src, max_len=4, bos_id=BOS,
                      use_cache=True)


def test_quantized_decode_warns(model_and_vars):
    """Int8 decode is measured slower than float (BASELINE.md); the decode
    entry points must say so out loud instead of silently taking it."""
    import warnings

    from chambers_tpu.models.generation import QuantizedDecodeWarning
    from chambers_tpu.quantization import quantize_variables

    module, variables = model_and_vars
    qvars = quantize_variables(variables)
    src = jnp.asarray(
        np.random.default_rng(31).integers(1, 16, (2, 8)), jnp.int32
    )
    with pytest.warns(QuantizedDecodeWarning):
        greedy_decode(module, qvars, src, max_len=4, bos_id=BOS)
    # Float variables must stay silent.
    with warnings.catch_warnings():
        warnings.simplefilter("error", QuantizedDecodeWarning)
        greedy_decode(module, variables, src, max_len=4, bos_id=BOS)


class TestTopKTopP:
    """apply_top_k_top_p: the serving-standard candidate restriction."""

    def test_top_k_masks_everything_below_kth(self):
        from chambers_tpu.models import apply_top_k_top_p

        logits = jnp.asarray([[4.0, 1.0, 3.0, 2.0, 0.0]])
        out = np.asarray(apply_top_k_top_p(logits, top_k=2))
        np.testing.assert_array_equal(out[0, [0, 2]], [4.0, 3.0])
        assert np.all(np.isneginf(out[0, [1, 3, 4]]))

    def test_top_k_threshold_ties_all_survive(self):
        from chambers_tpu.models import apply_top_k_top_p

        logits = jnp.asarray([[3.0, 3.0, 3.0, 1.0]])
        out = np.asarray(apply_top_k_top_p(logits, top_k=2))
        # threshold-compare semantics: all three tied maxima stay
        np.testing.assert_array_equal(out[0, :3], [3.0, 3.0, 3.0])
        assert np.isneginf(out[0, 3])

    def test_top_p_keeps_smallest_nucleus(self):
        from chambers_tpu.models import apply_top_k_top_p

        # probs ~ [0.643, 0.237, 0.087, 0.032] for logits [3, 2, 1, 0]
        logits = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
        out = np.asarray(apply_top_k_top_p(logits, top_p=0.7))
        # 0.643 < 0.7 so token 1 is still needed; strictly-above mass at
        # token 2 is 0.88 >= 0.7 -> masked
        np.testing.assert_array_equal(out[0, :2], [3.0, 2.0])
        assert np.all(np.isneginf(out[0, 2:]))

    def test_top_p_always_keeps_top1(self):
        from chambers_tpu.models import apply_top_k_top_p

        logits = jnp.asarray([[5.0, 0.0, 0.0, 0.0]])
        out = np.asarray(apply_top_k_top_p(logits, top_p=1e-6))
        assert out[0, 0] == 5.0
        assert np.all(np.isneginf(out[0, 1:]))

    def test_validation(self):
        from chambers_tpu.models import apply_top_k_top_p

        logits = jnp.zeros((1, 4))
        with pytest.raises(ValueError, match="top_k"):
            apply_top_k_top_p(logits, top_k=0)
        with pytest.raises(ValueError, match="top_p"):
            apply_top_k_top_p(logits, top_p=0.0)
        with pytest.raises(ValueError, match="top_p"):
            apply_top_k_top_p(logits, top_p=1.5)

    def test_sample_top_k1_equals_greedy(self, model_and_vars):
        from chambers_tpu.models import sample_decode

        module, variables = model_and_vars
        src = jnp.asarray(
            np.random.default_rng(41).integers(1, 16, (3, 8)), jnp.int32)
        want = greedy_decode(module, variables, src, max_len=8, bos_id=BOS)
        got = sample_decode(module, variables, src, jax.random.PRNGKey(0),
                            max_len=8, bos_id=BOS, temperature=1.0, top_k=1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_sample_cached_equals_full_with_top_k_top_p(self, model_and_vars):
        from chambers_tpu.models import sample_decode

        module, variables = model_and_vars
        src = jnp.asarray(
            np.random.default_rng(42).integers(1, 16, (3, 8)), jnp.int32)
        key = jax.random.PRNGKey(5)
        kwargs = dict(max_len=8, bos_id=BOS, temperature=1.3, top_k=5,
                      top_p=0.9)
        full = sample_decode(module, variables, src, key, use_cache=False,
                             **kwargs)
        cached = sample_decode(module, variables, src, key, use_cache=True,
                               **kwargs)
        np.testing.assert_array_equal(np.asarray(cached), np.asarray(full))


class TestBeamLengthPenalty:
    def test_zero_penalty_is_identity(self, model_and_vars):
        from chambers_tpu.models import beam_search_decode

        module, variables = model_and_vars
        src = jnp.asarray(
            np.random.default_rng(43).integers(1, 16, (3, 8)), jnp.int32)
        a = beam_search_decode(module, variables, src, max_len=8, bos_id=BOS,
                               beam_size=3, eos_id=2)
        b = beam_search_decode(module, variables, src, max_len=8, bos_id=BOS,
                               beam_size=3, eos_id=2, length_penalty=0.0)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_finalize_reranks_by_gnmt_penalty(self):
        from chambers_tpu.models.generation import _finalize_beams

        # beam 0: short (2 tokens) score -2; beam 1: long (6 tokens) -3.
        # raw ranking picks beam 0; alpha=1 normalizes to -2/(7/6)=-1.714 vs
        # -3/(11/6)=-1.636 -> beam 1 wins
        out = jnp.asarray([[[7, 2, 0, 0, 0, 0], [5, 5, 5, 5, 5, 2]]])
        scores = jnp.asarray([[-2.0, -3.0]])
        best0, s0 = _finalize_beams(out, scores, pad_id=0, length_penalty=0.0)
        np.testing.assert_array_equal(np.asarray(best0[0]), out[0, 0])
        best1, s1 = _finalize_beams(out, scores, pad_id=0, length_penalty=1.0)
        np.testing.assert_array_equal(np.asarray(best1[0]), out[0, 1])
        np.testing.assert_allclose(float(s1[0]), -3.0 / (11.0 / 6.0),
                                   rtol=1e-6)

    def test_length_penalty_jits(self, model_and_vars):
        from chambers_tpu.models import beam_search_decode

        module, variables = model_and_vars
        src = jnp.asarray(
            np.random.default_rng(44).integers(1, 16, (2, 8)), jnp.int32)
        seq, score = jax.jit(lambda v, s: beam_search_decode(
            module, v, s, max_len=8, bos_id=BOS, beam_size=3, eos_id=2,
            length_penalty=0.6, return_scores=True))(variables, src)
        assert seq.shape == (2, 8)
        assert np.isfinite(np.asarray(score)).all()


def test_top_k_larger_than_vocab_is_noop():
    """top_k >= vocab must degrade to no filtering (standard sampler
    semantics), not crash lax.top_k with an oversized k."""
    from chambers_tpu.models.generation import apply_top_k_top_p

    logits = jnp.asarray(np.random.RandomState(0).randn(2, 8), jnp.float32)
    out = apply_top_k_top_p(logits, top_k=50)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits))
