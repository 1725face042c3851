"""Registry hygiene: every ``register()`` call produces exactly one
REGISTRY entry (no silent shadowing — the r10 verdict found two
duplicate names whose earlier registrations were dead code), and a
collision raises immediately."""

import ast
import pathlib

import pytest

from neo4j_enterprise_spark import plans
from neo4j_enterprise_spark.plans import REGISTRY, all_queries, register

PLANS_DIR = pathlib.Path(plans.__file__).parent


def _register_call_names() -> list[str]:
    """Every literal first argument of a ``@register(...)`` decorator
    across the plans package, by AST (source of truth for 'how many
    registrations were written')."""
    names: list[str] = []
    for path in sorted(PLANS_DIR.glob("*.py")):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == "register"
                and node.args
                and isinstance(node.args[0], ast.Constant)
                and isinstance(node.args[0].value, str)
            ):
                names.append(node.args[0].value)
    return names


def test_no_duplicate_registrations():
    all_queries()  # import side-effect populates REGISTRY
    names = _register_call_names()
    dupes = {n for n in names if names.count(n) > 1}
    assert not dupes, f"duplicate register() names: {sorted(dupes)}"
    assert len(names) == len(set(names) & set(REGISTRY)) == len(REGISTRY)


def test_register_raises_on_collision():
    all_queries()
    existing = next(iter(REGISTRY))
    with pytest.raises(ValueError, match="duplicate query registration"):
        register(existing, None)(lambda spark, sf_dir: None)


def test_driver_priority_names_resolve():
    """Window names must be real registry entries — a typo here would
    silently shrink the driver's 50-slot correctness window."""
    queries = all_queries()
    from neo4j_enterprise_spark.plans import _DRIVER_PRIORITY

    missing = [n for n in _DRIVER_PRIORITY if n not in queries]
    assert not missing, f"_DRIVER_PRIORITY names not in REGISTRY: {missing}"
