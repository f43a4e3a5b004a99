"""Every tools/ script must stay importable and keep a working argparse
surface across library API changes (round-5 verdict item 9). Import
executes each module's top-level (catching renamed/removed library
symbols they bind at import time); --help exercises parser construction
for the CLI-shaped ones without running chip work."""

import importlib
import os
import pathlib
import sys

import pytest

TOOLS = sorted(
    p.stem for p in
    (pathlib.Path(__file__).resolve().parents[1] / "tools").glob("*.py"))

# scripts whose argparse lives in main(); --help exercised via sys.argv
CLI_TOOLS = {"bench_methods", "tpu_parity", "accuracy_gate"}


@pytest.mark.parametrize("name", TOOLS)
def test_tools_module_imports(name):
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    mod = importlib.import_module(f"tools.{name}")
    assert mod is not None


@pytest.mark.parametrize("name", sorted(CLI_TOOLS))
def test_tools_cli_help(name, monkeypatch, capsys):
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    mod = importlib.import_module(f"tools.{name}")
    monkeypatch.setattr(sys, "argv", [f"{name}.py", "--help"])
    with pytest.raises(SystemExit) as e:
        mod.main()
    assert e.value.code == 0
    assert "usage" in capsys.readouterr().out.lower()
