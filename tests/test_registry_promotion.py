"""Function-granular changed-since-checked promotion (r11, VERDICT r10
item 2's window math): _changed_functions is the pure AST-compare core
— these pin its contract so the rotation window can rely on it."""

from __future__ import annotations

from confluent_example_firehose_spark.registry import _changed_functions

OLD = '''
"""module docstring"""
import os
from x import y

CAP = 64


def helper(v):
    return v + 1


def q_a(spark, sf_dir):
    return helper(1)


def q_b(spark, sf_dir):
    return q_a(spark, sf_dir)


def q_c(spark, sf_dir):
    return CAP
'''

REGISTERED = {"q_a", "q_b", "q_c"}


def test_identical_source_changes_nothing():
    assert _changed_functions(OLD, OLD, REGISTERED) == set()


def test_comment_and_whitespace_only_changes_nothing():
    new = OLD.replace(
        "def q_c(spark, sf_dir):",
        "def q_c(spark,  sf_dir):  # a comment",
    )
    assert _changed_functions(OLD, new, REGISTERED) == set()


def test_one_function_body_change_promotes_only_it():
    new = OLD.replace("return CAP", "return CAP + 0")
    assert _changed_functions(OLD, new, REGISTERED) == {"q_c"}


def test_import_additions_are_exempt():
    new = OLD.replace(
        "from x import y", "from x import y\nfrom x import z"
    ).replace("return CAP", "return CAP + 0")
    assert _changed_functions(OLD, new, REGISTERED) == {"q_c"}


def test_module_constant_change_promotes_all():
    new = OLD.replace("CAP = 64", "CAP = 128")
    assert _changed_functions(OLD, new, REGISTERED) is None


def test_nonregistered_helper_change_promotes_all():
    new = OLD.replace("return v + 1", "return v + 2")
    assert _changed_functions(OLD, new, REGISTERED) is None


def test_reference_closure_promotes_caller_too():
    # q_b calls q_a; changing q_a must promote both
    new = OLD.replace("return helper(1)", "return helper(2)")
    assert _changed_functions(OLD, new, REGISTERED) == {"q_a", "q_b"}


def test_new_registered_function_counts_as_changed():
    new = OLD + "\n\ndef q_d(spark, sf_dir):\n    return 1\n"
    got = _changed_functions(OLD, new, REGISTERED | {"q_d"})
    assert got == {"q_d"}


def test_docstring_edit_inside_function_promotes_it():
    # a docstring is part of the function body AST — conservative
    new = OLD.replace(
        "def q_c(spark, sf_dir):\n    return CAP",
        'def q_c(spark, sf_dir):\n    """doc"""\n    return CAP',
    )
    assert _changed_functions(OLD, new, REGISTERED) == {"q_c"}


def test_syntax_error_promotes_all():
    assert _changed_functions(OLD, "def broken(", REGISTERED) is None


def test_attribute_and_string_references_promote_caller():
    """ADVICE r11 item 3: a registered function reaching another via
    attribute access (mod.q_a) or a string registry lookup
    (fns["q_a"]) must promote with its dependency, same as a plain
    Name reference."""
    old = (
        "import m\n"
        "def q_a(spark, sf):\n    return 1\n"
        "def q_b(spark, sf):\n    return m.q_a(spark, sf)\n"
        "def q_c(spark, sf):\n    return spark.run('q_a')\n"
        "def q_d(spark, sf):\n    return 4\n"
    )
    new = old.replace("return 1", "return 2")
    got = _changed_functions(old, new, {"q_a", "q_b", "q_c", "q_d"})
    assert got == {"q_a", "q_b", "q_c"}


def test_import_rewire_promotes_all():
    """ADVICE r11: rebinding an imported name to a DIFFERENT source
    module changes every caller's behavior with zero function-AST
    change — the detector must fall back to promote-all. Additions and
    removals of import names stay exempt (a dropped used import is a
    loud module ImportError, never silent)."""
    from confluent_example_firehose_spark.registry import (
        _changed_functions,
    )

    old = (
        "from .dedup import jaccard\n"
        "def q_a(spark, sf):\n    return jaccard\n"
    )
    rewired = (
        "from .textkit import jaccard\n"
        "def q_a(spark, sf):\n    return jaccard\n"
    )
    added = (
        "from .dedup import jaccard, words\n"
        "def q_a(spark, sf):\n    return jaccard\n"
    )
    aliased = (
        "from .dedup import minhash as jaccard\n"
        "def q_a(spark, sf):\n    return jaccard\n"
    )
    assert _changed_functions(old, rewired, {"q_a"}) is None
    assert _changed_functions(old, aliased, {"q_a"}) is None
    assert _changed_functions(old, added, {"q_a"}) == set()
    assert _changed_functions(old, old, {"q_a"}) == set()
