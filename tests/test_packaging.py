"""Packaging metadata sanity: every console entry point in pyproject.toml
resolves to an importable callable, and the declared packages exist."""

import importlib
import pathlib
import tomllib

REPO = pathlib.Path(__file__).resolve().parents[1]


def _pyproject():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def _project():
    return _pyproject()["project"]


def _repo_module_name(mod_name: str) -> str:
    """Translate an installed module path to its in-repo import path via
    [tool.setuptools.package-dir] (e.g. tokenreduction_analysis.x ->
    analysis.x: the analysis suite installs under a namespaced package
    name but lives at repo-root analysis/)."""
    pkg_dir = _pyproject().get("tool", {}).get("setuptools", {}).get(
        "package-dir", {})
    top, _, rest = mod_name.partition(".")
    if top in pkg_dir:
        top = pkg_dir[top].replace("/", ".")
    return f"{top}.{rest}" if rest else top


def test_entry_points_resolve():
    scripts = _project()["scripts"]
    assert scripts, "no console scripts declared"
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(_repo_module_name(mod_name))
        fn = getattr(mod, func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_declared_packages_exist():
    cfg = _pyproject()["tool"]["setuptools"]
    pkg_dir = cfg.get("package-dir", {})
    for pkg in cfg["packages"]:
        rel = pkg_dir.get(pkg, pkg.replace(".", "/"))
        assert (REPO / rel / "__init__.py").is_file(), pkg


def test_base_deps_cover_console_script_imports():
    """The eval batch drivers import pandas at module top-level; a plain
    install (no extras) must be able to run every console script, so
    pandas belongs in the base dependencies."""
    deps = " ".join(_project()["dependencies"])
    assert "pandas" in deps


def test_no_generic_top_level_package_installed():
    """The wheel must not claim the bare name `analysis` (or any other
    collision-prone generic top-level name)."""
    cfg = _pyproject()["tool"]["setuptools"]
    for pkg in cfg["packages"]:
        assert pkg.split(".")[0].startswith("tokenreduction"), pkg


def test_version_matches_package():
    import tokenreduction_tpu

    assert _project()["version"] == tokenreduction_tpu.__version__
