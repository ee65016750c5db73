"""Smoke tests for the runnable examples (tiny configs, synthetic data).

Each example is executed in-process with argv overrides so regressions in
the public APIs they compose (Trainer, models, losses, data) surface here
rather than when a user runs the script.
"""

import os
import runpy
import sys

import pytest

_EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


def _run_example(name, argv):
    old_argv = sys.argv
    sys.argv = [name] + argv
    try:
        runpy.run_path(os.path.join(_EXAMPLES, name), run_name="__main__")
    finally:
        sys.argv = old_argv


def test_train_seq2seq_example(capsys):
    _run_example("train_seq2seq.py", [
        "--vocab", "16", "--seq-len", "6", "--batch", "16",
        "--epochs", "1", "--steps-per-epoch", "4",
    ])
    out = capsys.readouterr().out
    assert "greedy decode token accuracy" in out


@pytest.mark.slow
def test_train_cnn_classifier_example(capsys):
    _run_example("train_cnn_classifier.py", [
        "--classes", "4", "--image-size", "32", "--batch", "2",
        "--epochs", "1", "--steps-per-epoch", "2",
    ])
    out = capsys.readouterr().out
    assert "batch_stats moved" in out


def test_train_moe_vit_example(capsys):
    """Top-2 routed ViT trains through the Trainer on an EP x DP mesh."""
    _run_example("train_moe_vit.py", [
        "--classes", "4", "--image-size", "16", "--batch", "8",
        "--epochs", "2", "--steps-per-epoch", "4",
        "--experts", "4", "--top-k", "2", "--dp", "2", "--ep", "4",
    ])
    out = capsys.readouterr().out
    assert "mesh: data=2 x expert=4" in out
    assert "moe aux loss" in out


def test_serve_quantized_example(capsys, tmp_path):
    _run_example("serve_quantized.py", [
        "--image-size", "32", "--patch-size", "8", "--dim", "64",
        "--layers", "2", "--heads", "4", "--ff", "128",
        "--out", str(tmp_path / "tiny_int8.stablehlo"),
    ])
    out = capsys.readouterr().out
    assert "relative logit error" in out
    assert "served logits shape: (4," in out


def test_train_detr_example(capsys):
    _run_example("train_detr.py", [
        "--steps", "3", "--batch", "4", "--size", "32",
    ])
    out = capsys.readouterr().out
    assert "final-layer object predictions" in out


def test_train_deit_recipe_example(capsys, tmp_path):
    """RandAugment + MixUp/CutMix + AdamW/cosine + EMA + FSDP + TensorBoard
    compose into one training run (the DeiT recipe stack)."""
    _run_example("train_deit_recipe.py", [
        "--classes", "4", "--image-size", "32", "--patch-size", "8",
        "--batch", "16", "--epochs", "1", "--steps-per-epoch", "3",
        "--logdir", str(tmp_path / "logs"),
    ])
    out = capsys.readouterr().out
    assert "ema shadow differs" in out
    assert "tensorboard events: 1 file(s)" in out
    assert "fsdp: dense1 kernel stored per-device" in out


def test_train_metric_learning_example(capsys, tmp_path):
    _run_example("train_metric_learning.py", [
        "--image-size", "24", "--p", "4", "--k", "2",
        "--epochs", "1", "--steps", "3",
        "--experiments", str(tmp_path / "experiments"),
    ])
    out = capsys.readouterr().out
    assert "recall@1" in out


def test_finetune_lora_example(capsys):
    _run_example("finetune_lora.py", [
        "--classes", "4", "--image-size", "32", "--batch", "4",
        "--epochs", "1", "--steps-per-epoch", "2", "--rank", "2",
        "--layers", "1",
    ])
    out = capsys.readouterr().out
    assert "frozen backbone unchanged: True" in out
    assert "merge max|delta|: 0.0" in out


def test_train_keras_frontdoor_example(capsys):
    _run_example("train_keras_frontdoor.py", [
        "--n", "48", "--size", "16", "--batch", "16", "--epochs", "1",
        "--cpu",
    ])
    out = capsys.readouterr().out
    assert "final:" in out and "accuracy=" in out and "predictions=" in out
