"""Query registry: every declared query pairs a Spark callable with its
DuckDB oracle SQL (or None for rows-only checks).

Contract (driver): callable(spark, sf_dir) -> DataFrame; oracle SQL runs
on DuckDB views of the same parquet. Column names must match exactly —
alias everything identically on both sides. Hash compare is
order-insensitive, so ORDER BY is only needed where a LIMIT makes the
row *set* order-dependent (always give those a total order).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Union

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# An oracle is DuckDB SQL. A callable oracle is resolved lazily at
# oracle_sqls() time — needed when the SQL embeds DATA-DEPENDENT
# literals (q_similarity_ivf's trained centroids) that must be computed
# from the same parquet the comparison reads, not at import time.
OracleSpec = Union[str, Callable[[], Optional[str]], None]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: OracleSpec  # DuckDB SQL, or None -> rows-only check

    def oracle_sql(self) -> Optional[str]:
        """Resolve the oracle to SQL (or None -> rows-only). Callable
        oracles may themselves return None (e.g. testdata missing at
        resolve time) — that degrades to a rows-only check instead of
        crashing the driver's collection pass."""
        if callable(self.oracle):
            return self.oracle()
        return self.oracle


def register(name: str, oracle: OracleSpec = None):
    """Decorator: @register("q_name", oracle="SELECT ...")."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


# Window head: the driver only records the FIRST 50 entries of
# queries() each round, so ordering is rotation state. The order is now
# computed from the CORRECTNESS_r*.json history on disk (see
# _driver_history): never-driver-checked queries come UNCONDITIONALLY
# first (VERDICT r4 item 1 — three r4 additions sat at positions 51-53
# and never got a row), then this round's re-adjudications (_RECHECK:
# queries whose output or oracle changed this round), then everything
# else, least-recently-checked first.
_RECHECK: tuple[str, ...] = (
    # r13: the dedup.py KERNEL edits (NEAR_BUCKET_CAP shared constant,
    # data-identity memo keys) change plan choice for the simhash pair
    # without touching any registered function body — exactly the
    # kernel-only case the AST 2b detector cannot see. Everything else
    # this round is visible to 2b: the stream-dedup rework changed the
    # four stream query bodies, the corpus-scalar memo changed
    # q_text_bm25 / q_text_tfidf / q_lm_commonness, and q_dedup_near's
    # body carries the shared-cap line.
    "q_dedup_simhash",
    "q_dedup_simhash8",
)
# NOTE: tier 2 is additionally fed by _changed_since_checked() below
# (VERDICT r6 item 2) — queries whose implementing code changed in a
# round after the query's latest CORRECTNESS row are auto-promoted, so
# a reshape-after-check can no longer silently wait out a full
# staleness rotation. Since r11 the detector is FUNCTION-granular
# (VERDICT r10 item 2's window math: a 10-query module edited for two
# functions would otherwise crowd 10 of the 50 window slots and push
# the r6 staleness cohort out of rotation): within an edited module,
# only queries whose own function AST changed since the round marker —
# or that reference a changed registered function — promote, and ANY
# change to module-level code other than imports and the module
# docstring falls back to promoting the whole module (helpers,
# constants, and oracle scaffolds are shared state; the conservative
# fallback keeps the r6 contract). Kernel-only edits (e.g. dedup.py,
# graph.py — files that register no queries themselves) are STILL not
# seen: list their queries here explicitly when the edit is not
# already visible in the query function bodies.

def _changed_functions(
    old_src: str, new_src: str, registered: set
) -> Optional[set]:
    """Which registered top-level function names changed between two
    versions of a module's source — the pure core of the function-
    granular 2b detector (unit-tested directly in
    tests/test_registry_promotion.py).

    Returns the set of changed registered-function names, closed over
    same-module references between registered functions (if registered
    fn A's body names changed registered fn B, A promotes too), or
    None — the promote-ALL fallback — when anything outside registered
    function defs changed: module-level constants, non-registered
    helpers, class defs, oracle scaffolds. The module docstring is
    exempt from the residue compare; imports are exempt for ADDITIONS
    and REMOVALS only (adding an import for a new function, dropping
    an unused one — dropping a USED one is a loud module ImportError,
    never silent) — but a REWIRE, the same bound name now imported
    from a different source (ADVICE r11: `from .dedup import jaccard`
    -> `from .textkit import jaccard` changes every caller's behavior
    with zero AST change in any function), triggers the promote-ALL
    fallback. Comparison is ast.dump without attributes, so comment/
    whitespace/formatting-only edits promote nothing."""
    import ast

    try:
        old_tree, new_tree = ast.parse(old_src), ast.parse(new_src)
    except SyntaxError:
        return None

    def split(tree):
        fns: dict[str, str] = {}
        residue: list[str] = []
        refs: dict[str, set] = {}
        imports: dict[str, tuple] = {}
        body = list(tree.body)
        if (
            body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            body = body[1:]  # module docstring
        for node in body:
            if (
                isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
                and node.name in registered
            ):
                fns[node.name] = ast.dump(node)
                # Reference closure captures plain names, attribute
                # accesses (mod.q_other), AND string constants matching
                # a registered name (string registry lookups) — ADVICE
                # r11 item 3: the Name-only form missed the latter two
                # reach patterns. Over-capture is safe (it only
                # promotes a query into the recheck window early).
                refs[node.name] = (
                    {
                        n.id
                        for n in ast.walk(node)
                        if isinstance(n, ast.Name)
                    }
                    | {
                        n.attr
                        for n in ast.walk(node)
                        if isinstance(n, ast.Attribute)
                    }
                    | {
                        n.value
                        for n in ast.walk(node)
                        if isinstance(n, ast.Constant)
                        and isinstance(n.value, str)
                        and n.value in registered
                    }
                )
            elif isinstance(node, ast.ImportFrom):
                for a in node.names:
                    imports[a.asname or a.name] = (
                        "from", node.level, node.module or "", a.name
                    )
            elif isinstance(node, ast.Import):
                for a in node.names:
                    imports[a.asname or a.name.split(".")[0]] = (
                        "import", a.name
                    )
            else:
                residue.append(ast.dump(node))
        return fns, residue, refs, imports

    old_fns, old_residue, _, old_imports = split(old_tree)
    new_fns, new_residue, new_refs, new_imports = split(new_tree)
    if old_residue != new_residue:
        return None
    for name in set(old_imports) & set(new_imports):
        if old_imports[name] != new_imports[name]:
            return None  # import REWIRE: same name, different source
    changed = {
        n
        for n in set(old_fns) | set(new_fns)
        if old_fns.get(n) != new_fns.get(n)
    }
    while True:  # transitive closure over intra-module references
        more = {
            n
            for n, names in new_refs.items()
            if n not in changed and names & changed
        }
        if not more:
            return changed
        changed |= more


_CHANGED_MEMO: dict[str, set] = {}


def _changed_since_checked(history: dict[str, int]) -> set[str]:
    """Names whose implementing module was modified in a LATER build
    round than the query's latest driver CORRECTNESS row (VERDICT r6
    item 2). The driver adjudicates the end-of-round tree, so a commit
    belongs to round N+1 iff it is after the driver's 'round N: ...'
    marker commit; a module whose last-touching commit falls in round M
    with a query last checked in round R < M has changed since that
    query was last adjudicated. Uncommitted (dirty) modules count as
    modified in the current round. Degrades to the empty set on any git
    failure — the static _RECHECK tuple still applies. Memoized per
    process (the driver calls all_queries() once each for queries(),
    oracle_sql(), and the window ordering — git state cannot change
    between those calls)."""
    import os
    import re
    import subprocess

    memo_key = repr(sorted(history.items()))
    if memo_key in _CHANGED_MEMO:
        return _CHANGED_MEMO[memo_key]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def git(*args: str) -> str:
        return subprocess.run(
            ["git", *args], cwd=root, capture_output=True, text=True,
            timeout=30, check=True,
        ).stdout

    try:
        # hash -> round: walk history oldest-first; 'round N:' driver
        # commits close round N, so subsequent commits are round N+1.
        commit_round: dict[str, int] = {}
        markers: dict[int, str] = {}  # round N -> its closing commit
        rnd = 1
        for line in git("log", "--reverse", "--format=%H %s").splitlines():
            h, _, subj = line.partition(" ")
            commit_round[h] = rnd
            m = re.match(r"round (\d+):", subj)
            if m:
                markers[int(m.group(1))] = h
                rnd = int(m.group(1)) + 1
        current_round = rnd

        # NUL-separated porcelain: no quoting/escaping ambiguity, and
        # rename/copy records carry the ORIGINAL path as a second
        # NUL-separated field ("XY new\0old\0") — mark both names dirty
        # so a renamed-dirty module still auto-promotes its queries.
        dirty: set[str] = set()
        fields = git("status", "--porcelain", "-z").split("\0")
        i = 0
        while i < len(fields):
            rec = fields[i]
            i += 1
            if len(rec) < 4:
                continue
            dirty.add(rec[3:])
            if rec[0] in "RC" and i < len(fields) and fields[i]:
                dirty.add(fields[i])
                i += 1

        mod_round: dict[str, int] = {}  # module name -> round of last edit

        def module_round(mod: str) -> int:
            if mod not in mod_round:
                rel = mod.replace(".", "/") + ".py"
                if rel in dirty:
                    mod_round[mod] = current_round
                else:
                    out = git("log", "-1", "--format=%H", "--", rel).strip()
                    mod_round[mod] = commit_round.get(out, 0)
            return mod_round[mod]

        reg_by_module: dict[str, set] = {}
        for spec in _REGISTRY.values():
            reg_by_module.setdefault(spec.fn.__module__, set()).add(
                spec.fn.__name__
            )

        fine_memo: dict[tuple, Optional[set]] = {}

        def fine_changed(mod: str, checked: int) -> Optional[set]:
            """Registered-fn names in `mod` changed since round
            `checked`'s marker tree (the tree the driver adjudicated),
            or None -> promote the module's whole backlog (marker or
            old blob unavailable, or module-level residue changed)."""
            key = (mod, checked)
            if key not in fine_memo:
                out: Optional[set] = None
                marker = markers.get(checked)
                rel = mod.replace(".", "/") + ".py"
                if marker is not None:
                    try:
                        old_src = git("show", f"{marker}:{rel}")
                        with open(os.path.join(root, rel)) as f:
                            new_src = f.read()
                        out = _changed_functions(
                            old_src, new_src, reg_by_module.get(mod, set())
                        )
                    except Exception:
                        out = None
                fine_memo[key] = out
            return fine_memo[key]

        changed: set[str] = set()
        for name, spec in _REGISTRY.items():
            checked = history.get(name)
            if checked is None:
                continue  # tier 1 handles never-checked
            mod = spec.fn.__module__
            if module_round(mod) > checked:
                fine = fine_changed(mod, checked)
                if fine is None or spec.fn.__name__ in fine:
                    changed.add(name)
        _CHANGED_MEMO[memo_key] = changed
        return changed
    except Exception:
        _CHANGED_MEMO[memo_key] = set()
        return set()


def _driver_history() -> dict[str, int]:
    """name -> latest round with a driver CORRECTNESS row, read from the
    committed CORRECTNESS_r*.json files at the repo root. Self-
    maintaining: a query absent from every file has never been driver-
    checked and must be ordered into the 50-entry window first."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def all_queries() -> dict[str, QuerySpec]:
    # Import for side effects: each module registers its queries.
    from .operators import (  # noqa: F401
        asof_queries,
        dedup_queries,
        firehose_queries,
        multimodal_queries,
        relational_ext_queries,
        relational_queries,
        similarity_queries,
        text_queries,
        tpch_queries,
        udf_queries,
        window_session_queries,
    )
    from .sources import file_sources  # noqa: F401
    from .streaming import streaming_queries  # noqa: F401

    from .operators import curation_queries  # noqa: F401
    from .operators import timeseries_queries  # noqa: F401
    from .operators import ir_queries  # noqa: F401
    from .operators import quality_queries  # noqa: F401
    from .operators import packing_queries  # noqa: F401
    from .operators import index_queries  # noqa: F401
    from .sources import pysource  # noqa: F401
    from .operators import analytics_queries  # noqa: F401
    from .operators import scoring_queries  # noqa: F401
    from .operators import split_queries  # noqa: F401
    from .operators import graph_queries  # noqa: F401
    from .operators import boilerplate_queries  # noqa: F401
    from .operators import retrieval_queries  # noqa: F401
    from .operators import dsir_queries  # noqa: F401
    from .operators import derep_queries  # noqa: F401
    from .operators import bloom_queries  # noqa: F401
    from .operators import community_queries  # noqa: F401
    from .operators import cms_queries  # noqa: F401
    from .operators import blocklist_queries  # noqa: F401
    from .operators import nb_queries  # noqa: F401
    from .operators import budget_queries  # noqa: F401
    from .operators import ann_recall_queries  # noqa: F401
    from .operators import sketch_stream_queries  # noqa: F401
    from .operators import index_stream_queries  # noqa: F401
    from .operators import dedup_stream_queries  # noqa: F401

    # Driver-priority ordering, four tiers inside the 50-entry window:
    #   1. never driver-checked (no CORRECTNESS row in any round) — in
    #      registration order; new queries ALWAYS land here;
    #   2. this round's explicit re-adjudications (_RECHECK order);
    #   2b. auto-promoted changed-since-checked (module edited in a
    #       round after the query's latest driver row — VERDICT r6
    #       item 2), stalest first;
    #   3. the rest, least-recently-checked round first, then
    #      registration order (rotates old greens back under the
    #      driver's eye across rounds).
    history = _driver_history()
    recheck = {name: i for i, name in enumerate(_RECHECK)}
    changed = _changed_since_checked(history)
    reg_pos = {name: i for i, name in enumerate(_REGISTRY)}
    ordered = sorted(
        _REGISTRY.items(),
        key=lambda kv: (
            kv[0] in history,  # tier 1: never-checked first
            recheck.get(kv[0], len(recheck)),  # tier 2
            kv[0] not in changed,  # tier 2b: changed code next
            history.get(kv[0], 0),  # tier 3: stalest first
            reg_pos[kv[0]],
        ),
    )
    return dict(ordered)


def query_fns() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, spec in all_queries().items():
        sql = spec.oracle_sql()
        if sql is not None:
            out[name] = sql
    return out
