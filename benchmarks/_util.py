"""Shared helpers for the benchmark scripts (run as plain scripts, so
importers add this directory to sys.path first)."""

import json
import os


def atomic_json_dump(path, obj):
    """Write JSON via a same-directory temp file + os.replace so a timeout
    or SIGKILL landing mid-dump can never truncate rows already persisted
    (the exact scenario incremental persistence exists for — ADVICE r4)."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=2)
    os.replace(tmp, path)
