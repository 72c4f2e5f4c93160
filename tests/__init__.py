# Regular package so `from tests.test_degenerate import ...` (used by the
# cross-engine fuzz suite) resolves under any invocation — `python -m
# pytest` from the repo root, bare `pytest tests/`, or an IDE runner —
# instead of relying on the rootdir landing on sys.path (ADVICE r6).
