"""Worker-side closures must be self-contained (no module-global
package references) — see tools/lint_worker_closures.py. A by-name
pickle reference resolves only if the executor's Python can import the
package, which the grading driver's workers (non-repo cwd) cannot;
caught live in r7 (q_dedup_semantic's assignment UDF calling the
module-level _seq_sqdist: ModuleNotFoundError at task start from a
/tmp-cwd session)."""

from __future__ import annotations

import os
import sys

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def test_no_module_global_refs_in_worker_closures():
    sys.path.insert(0, TOOLS)
    try:
        from lint_worker_closures import main
    finally:
        sys.path.remove(TOOLS)
    assert main() == 0
