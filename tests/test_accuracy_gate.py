"""tools/accuracy_gate.py: the one-command real-weights harness must run
its parity leg end-to-end on a DeiT-S-shaped .pth and fail loudly when
inputs are absent (VERDICT r2: produce the number the moment
weights+data are mounted; reference validate.py:84-100)."""

import sys

import pytest
import torch

from oracles import make_vit_state

sys.path.insert(0, "tools")


def test_gate_parity_leg_runs(tmp_path, capsys):
    import accuracy_gate

    state = make_vit_state(12, 384, 6, 16, 1000, seed=3, n_tokens=196)
    pth = str(tmp_path / "deit_small_patch16_224-cd65a155.pth")
    torch.save({"model": state}, pth)
    accuracy_gate.main(["--weights", pth])
    out = capsys.readouterr().out
    assert "logit parity" in out
    assert "PASS" in out


def test_gate_fails_loudly_without_weights(tmp_path, monkeypatch):
    import accuracy_gate

    monkeypatch.setenv("TOKENREDUCTION_WEIGHTS_DIR", str(tmp_path))
    with pytest.raises(SystemExit) as e:
        accuracy_gate.main([])
    assert e.value.code == 2


def test_gate_fails_on_missing_val_dir(tmp_path):
    import accuracy_gate

    state = make_vit_state(12, 384, 6, 16, 1000, seed=3, n_tokens=196)
    pth = str(tmp_path / "w.pth")
    torch.save({"model": state}, pth)
    with pytest.raises(SystemExit) as e:
        accuracy_gate.main(["--weights", pth,
                            "--data", str(tmp_path / "nope")])
    assert e.value.code == 2
