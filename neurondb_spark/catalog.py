"""Engine catalog: indexes, models, config — the Spark analog of the
reference's catalog tables (neurondb.ml_models etc., sql/ml_schema.sql:10-186,
index registry via reloptions).

A directory of JSON entries (one file per object) + artifact subdirs. At
cluster scale this would live on shared storage (S3/HDFS) next to the data;
the JSON-per-object layout needs no coordination service and is
last-writer-wins, which matches the reference's ordinary-table semantics.
"""

from __future__ import annotations

import json
import os
import re
import time

_NAME_RE = re.compile(r"^[A-Za-z0-9_.-]+$")


def _check_name(s: str, what: str) -> str:
    """Object names become filesystem path components — restrict to
    [A-Za-z0-9_.-]+ and forbid dot-runs so '../x' or '/etc/x' can't
    escape the catalog directory (PG quotes identifiers; a file catalog
    must validate)."""
    if not _NAME_RE.match(s) or s in (".", "..") or s.startswith(".."):
        raise ValueError(f"neurondb: invalid catalog {what} {s!r} "
                         "(allowed: letters, digits, '_', '.', '-')")
    return s


class Catalog:
    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    def _path(self, kind: str, name: str) -> str:
        return os.path.join(
            self.base_dir, _check_name(kind, "kind"),
            f"{_check_name(name, 'name')}.json",
        )

    def register(self, kind: str, name: str, meta: dict) -> dict:
        meta = dict(meta, name=name, kind=kind, registered_at=time.time())
        p = self._path(kind, name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            json.dump(meta, f, indent=1)
        return meta

    def get(self, kind: str, name: str) -> dict | None:
        p = self._path(kind, name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def list(self, kind: str) -> list[dict]:
        d = os.path.join(self.base_dir, kind)
        if not os.path.isdir(d):
            return []
        out = []
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    out.append(json.load(f))
        return out

    def drop(self, kind: str, name: str) -> bool:
        p = self._path(kind, name)
        if os.path.exists(p):
            os.remove(p)
            return True
        return False

    def artifact_dir(self, kind: str, name: str) -> str:
        d = os.path.join(
            self.base_dir, _check_name(kind, "kind"), _check_name(name, "name")
        )
        os.makedirs(d, exist_ok=True)
        return d
