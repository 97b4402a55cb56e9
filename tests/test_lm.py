"""Unigram LM fit/score: probabilities sum to 1, OOV -inf convention,
null-text drop, empty-string token, cross-corpus scoring."""

import math

import numpy as np
import pyarrow as pa


def test_fit_and_score_roundtrip(ray_session):
    import ray

    from jsonschema_validator_ray.ops.lm import unigram_fit, unigram_score

    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b a", "b b", None], pa.string()),
    }))
    vocab, logprob, total = unigram_fit(ds, "text")
    assert total == 5                      # null text contributes nothing
    assert vocab.to_pylist() == ["a", "b"]
    # ln(2/5), ln(3/5)
    assert np.allclose(logprob, [math.log(2 / 5), math.log(3 / 5)])
    assert abs(sum(math.exp(p) for p in logprob) - 1.0) < 1e-12

    out = unigram_score(ds, "id", "text", vocab, logprob) \
        .take_all()
    by_id = {r["id"]: r for r in out}
    assert set(by_id) == {1, 2}            # null-text row dropped
    assert by_id[1]["n_tokens"] == 3
    exp1 = (2 * math.log(2 / 5) + math.log(3 / 5)) / 3
    assert abs(by_id[1]["avg_logprob"] - exp1) < 1e-12


def test_oov_scores_minus_inf(ray_session):
    import ray

    from jsonschema_validator_ray.ops.lm import unigram_fit, unigram_score

    fit_ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1], pa.int64()),
        "text": pa.array(["x y"], pa.string())}))
    vocab, logprob, _ = unigram_fit(fit_ds, "text")
    score_ds = ray.data.from_arrow(pa.table({
        "id": pa.array([9, 10], pa.int64()),
        "text": pa.array(["x y", "x z"], pa.string())}))
    out = {r["id"]: r["avg_logprob"]
           for r in unigram_score(score_ds, "id", "text",
                                  vocab, logprob).take_all()}
    assert math.isfinite(out[9])
    assert out[10] == -math.inf            # unseen token 'z'


def test_empty_vocab_scores_all_minus_inf(ray_session):
    """Fitting on an all-null corpus yields an empty vocab; scoring must
    then give every doc -inf, not IndexError (review r5)."""
    import ray

    from jsonschema_validator_ray.ops.lm import unigram_fit, unigram_score

    fit_ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1], pa.int64()),
        "text": pa.array([None], pa.string())}))
    vocab, logprob, total = unigram_fit(fit_ds, "text")
    assert total == 0 and len(vocab) == 0
    score_ds = ray.data.from_arrow(pa.table({
        "id": pa.array([5], pa.int64()),
        "text": pa.array(["a b"], pa.string())}))
    out = unigram_score(score_ds, "id", "text", vocab, logprob).take_all()
    assert out[0]["avg_logprob"] == -math.inf


def test_empty_string_is_one_empty_token(ray_session):
    """'' splits to [''] on both the engine and DuckDB sides — it must
    count as one token, not zero."""
    import ray

    from jsonschema_validator_ray.ops.lm import unigram_fit, unigram_score

    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["", "a"], pa.string())}))
    vocab, logprob, total = unigram_fit(ds, "text")
    assert total == 2
    assert vocab.to_pylist() == ["", "a"]
    out = {r["id"]: r["n_tokens"]
           for r in unigram_score(ds, "id", "text",
                                  vocab, logprob).take_all()}
    assert out == {1: 1, 2: 1}
