"""HTTP shim over :class:`cassandra_diff_spark.api.JournalQueries` — the
reference api-server's REST surface (DiffAPIServer.java:35-57) on the
stdlib ``http.server`` (no extra dependencies).

Routes mirror DiffJobsResource.java:46-201 + HealthResource.java:35-57:

  GET /jobs/running/id                          running job ids
  GET /jobs/running                             running job summaries
  GET /jobs/recent                              recent job summaries
  GET /jobs/{jobid}                             one job summary
  GET /jobs/{jobid}/results                     per-table 9-counter stats
  GET /jobs/{jobid}/status                      completed vs planned splits
  GET /jobs/{jobid}/mismatches                  mismatch journal rows
  GET /jobs/{jobid}/errors                      per-token error detail
  GET /jobs/{jobid}/errors/summary              error count per table
  GET /jobs/{jobid}/errors/ranges               failed (table, split) units
  GET /jobs/by-start-date/{after}[/{before}]    date-range scan
  GET /jobs/by-source-cluster/{source}          index-replacement scans
  GET /jobs/by-target-cluster/{target}
  GET /jobs/by-keyspace/{keyspace}
  GET /__health                                 {"status": "healthy"}

Responses are JSON arrays of row objects (``DataFrame.toJSON`` shapes —
the same shapes documented in README); a missing journal table is a 404.

The server holds ONE SparkSession and serves queries from it; every
endpoint is a driver-side metadata query over the parquet journal, never
a data-plane scan, so a single session is the right concurrency model
(reference: one DBService over one C* session pool).
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from cassandra_diff_spark.api import JournalQueries


def _rows(df: DataFrame) -> list[dict]:
    return [json.loads(s) for s in df.toJSON().collect()]


def _routes(q: JournalQueries) -> list[tuple[re.Pattern, Callable]]:
    """Ordered route table: most specific first; handlers return any
    JSON-serializable object."""
    return [
        (re.compile(r"^/jobs/running/id$"), lambda m: q.running_jobs()),
        (re.compile(r"^/jobs/running$"), lambda m: _rows(q.running_job_summaries())),
        (re.compile(r"^/jobs/recent$"), lambda m: _rows(q.recent_jobs())),
        (
            re.compile(r"^/jobs/by-start-date/([^/]+)/([^/]+)$"),
            lambda m: _rows(q.jobs_started_between(m.group(1), m.group(2))),
        ),
        (
            re.compile(r"^/jobs/by-start-date/([^/]+)$"),
            lambda m: _rows(q.jobs_started_between(m.group(1))),
        ),
        (
            re.compile(r"^/jobs/by-source-cluster/([^/]+)$"),
            lambda m: _rows(q.jobs_by_source_cluster(m.group(1))),
        ),
        (
            re.compile(r"^/jobs/by-target-cluster/([^/]+)$"),
            lambda m: _rows(q.jobs_by_target_cluster(m.group(1))),
        ),
        (
            re.compile(r"^/jobs/by-keyspace/([^/]+)$"),
            lambda m: _rows(q.jobs_by_keyspace(m.group(1))),
        ),
        (re.compile(r"^/jobs/([^/]+)/results$"), lambda m: _rows(q.job_results(m.group(1)))),
        (re.compile(r"^/jobs/([^/]+)/status$"), lambda m: _rows(q.job_status(m.group(1)))),
        (
            re.compile(r"^/jobs/([^/]+)/mismatches$"),
            lambda m: _rows(q.mismatches(m.group(1))),
        ),
        (
            re.compile(r"^/jobs/([^/]+)/errors/summary$"),
            lambda m: _rows(q.error_summary(m.group(1))),
        ),
        (
            re.compile(r"^/jobs/([^/]+)/errors/ranges$"),
            lambda m: _rows(q.error_ranges(m.group(1))),
        ),
        (re.compile(r"^/jobs/([^/]+)/errors$"), lambda m: _rows(q.error_details(m.group(1)))),
        (re.compile(r"^/jobs/([^/]+)$"), lambda m: _rows(q.job_summary(m.group(1)))),
        (re.compile(r"^/__health$"), lambda m: q.health()),
    ]


class _Handler(BaseHTTPRequestHandler):
    routes: list[tuple[re.Pattern, Callable]] = []

    def do_GET(self):  # noqa: N802 — http.server API
        path = self.path.split("?", 1)[0]
        for pattern, handler in self.routes:
            m = pattern.match(path)
            if not m:
                continue
            try:
                payload, code = handler(m), 200
            except FileNotFoundError as e:
                payload, code = {"error": str(e)}, 404
            except Exception as e:  # noqa: BLE001 — surface as 500, keep serving
                payload, code = {"error": str(e)}, 500
            return self._send(code, payload)
        self._send(404, {"error": f"no such endpoint: {path}"})

    def _send(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet by default
        pass


def start_server(
    spark: SparkSession, journal_path: str, port: int = 0
) -> tuple[ThreadingHTTPServer, int]:
    """Start the API server on ``port`` (0 = ephemeral) in a daemon
    thread; returns (server, bound_port). ``server.shutdown()`` stops it."""
    q = JournalQueries(spark, journal_path)
    handler = type("BoundHandler", (_Handler,), {"routes": _routes(q)})
    server = ThreadingHTTPServer(("127.0.0.1", port), handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, server.server_address[1]


def main(argv: list[str] | None = None) -> None:
    """CLI: ``python -m cassandra_diff_spark.http_api JOURNAL_PATH [PORT]``."""
    import sys

    from cassandra_diff_spark.session import get_spark

    args = argv if argv is not None else sys.argv[1:]
    if not args:
        raise SystemExit("usage: http_api JOURNAL_PATH [PORT]")
    journal_path = args[0]
    port = int(args[1]) if len(args) > 1 else 8089
    spark = get_spark("cds-api-server")
    server, bound = start_server(spark, journal_path, port)
    print(f"serving diff API on http://127.0.0.1:{bound} (journal: {journal_path})")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
