"""Packaging metadata sanity: every console entry point in pyproject.toml
resolves to an importable callable, and the declared packages exist."""

import importlib
import pathlib
import tomllib

REPO = pathlib.Path(__file__).resolve().parents[1]


def _project():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)["project"]


def test_entry_points_resolve():
    scripts = _project()["scripts"]
    assert scripts, "no console scripts declared"
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_version_matches_package():
    import tokenreduction_tpu

    assert _project()["version"] == tokenreduction_tpu.__version__
