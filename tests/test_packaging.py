"""Packaging surface: pyproject console entry points resolve, package
discovery covers every subpackage, and the native C++ source ships as
package data (a wheel built from this tree must be able to rebuild
_ingest.so on the target host — motionstyle/native/build.py)."""
import importlib
import os
import tomllib

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve(pyproject):
    scripts = pyproject["project"]["scripts"]
    assert len(scripts) >= 11
    for name, target in scripts.items():
        mod_name, attr = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, attr)
        assert callable(fn), name
        # every CLI main must accept argv=None (console-script calling
        # convention: invoked with no arguments)
        import inspect

        params = inspect.signature(fn).parameters
        assert "argv" in params and params["argv"].default is None, name


def test_every_cli_module_has_a_console_script(pyproject):
    targets = {v.split(":")[0] for v in pyproject["project"]["scripts"].values()}
    cli_dir = os.path.join(ROOT, "motionstyle", "cli")
    mains = set()
    for fn in os.listdir(cli_dir):
        if not fn.endswith(".py") or fn.startswith("_"):
            continue
        with open(os.path.join(cli_dir, fn)) as f:
            if "\ndef main(" in f.read():
                mains.add(f"motionstyle.cli.{fn[:-3]}")
    # parser_util/model_util are libraries (no main); every main-bearing
    # CLI module must be reachable as an installed command
    assert mains == targets, mains.symmetric_difference(targets)


def test_native_source_is_package_data(pyproject):
    data = pyproject["tool"]["setuptools"]["package-data"]
    assert any(p.endswith(".cc") for p in data["motionstyle.native"])
    assert os.path.exists(os.path.join(ROOT, "motionstyle", "native", "src", "ingest.cc"))


def test_core_dependencies_are_importable(pyproject):
    """The declared core deps match what this environment actually provides
    (guards against declaring a dep that the code doesn't need or missing
    one it does)."""
    import re

    for dep in pyproject["project"]["dependencies"]:
        mod = re.split(r"[<>=\[ ]", dep)[0]
        importlib.import_module({"torch": "torch"}.get(mod, mod))
