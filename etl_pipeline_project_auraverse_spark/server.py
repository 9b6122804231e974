"""Thin HTTP serving shim over the ETL engine (reference parity K4 +
serving layer).

Mirrors the reference Express server's surface (``backend/server.js``):

- ``POST /run-etl``   (server.js:14-74) — multipart upload field
  ``inputFile``; the file extension picks the extract type
  (csv/json/txt, server.js:22-25); the config-driven pipeline runs
  under a 60 s deadline (server.js:45-48 — there a SIGKILL on the
  child; here ``JobDeadline`` cancels the Spark job group); the
  response is ``{success, table, schema}`` with the output CSV as row
  dicts (server.js:58-66, csvtojson semantics: every value a string).
- ``GET /schema/<sourceid>`` (server.js:76-85) — the stored schema
  artifact, 404 + ``{"error": "Schema not found."}`` when absent.
- ``GET /download``   (server.js:88-91) — the output CSV as an
  attachment named ``structured_table.csv``.

Design notes: the server is stdlib-only (``http.server``) and holds
ONE long-lived SparkSession — unlike the reference, which spawns a
fresh Python process (and therefore pays full engine startup) per
request. Uploads are staged exactly like the reference
(``data/uploaded_input<ext>``, server.js:26-27). ``config.yaml`` in
the workdir overrides the default pipeline config; per the hardening
notes in ``operators/config_ops.py``, configs are operator-trusted —
the upload path only ever supplies DATA, never config.
"""

from __future__ import annotations

import json
import os
import re
import threading
from email.parser import BytesParser
from email.policy import default as _email_policy
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql import SparkSession

from etl_pipeline_project_auraverse_spark import frontend
from etl_pipeline_project_auraverse_spark.pipeline import run_etl_pipeline
from etl_pipeline_project_auraverse_spark.session import get_spark
from etl_pipeline_project_auraverse_spark.sinks import TABLE_ROW_CAP

DEFAULT_TIMEOUT_SEC = 60.0  # server.js:48

# schema source ids are plain tokens; anything else (slashes, dots) is
# a traversal attempt on the schemas dir — reject before path join
_SOURCE_ID_RE = re.compile(r"^[A-Za-z0-9_-]+$")


def default_config(workdir: str, file_type: str = "txt") -> dict[str, Any]:
    """The server-side pipeline config. A ``config.yaml`` in the
    workdir wins (reference reads/rewrites its own, server.js:30-38);
    otherwise a minimal default mirroring its shape."""
    cfg_path = os.path.join(workdir, "config.yaml")
    if os.path.exists(cfg_path):
        import yaml

        with open(cfg_path, encoding="utf-8") as f:
            return yaml.safe_load(f)
    return {
        "extract": {
            "type": file_type,
            "source": os.path.join(workdir, "data", f"uploaded_input.{file_type}"),
            "source_id": "default_source",
            "retry_count": 3,
            "retry_delay": 0.1,
        },
        "transform": {"drop_duplicates": True},
        "load": {"type": "csv", "destination": os.path.join(workdir, "data", "output.csv")},
        "monitoring": {"enabled": False},
    }


def _read_csv_rows(path: str, max_rows: int = TABLE_ROW_CAP) -> tuple[list[dict[str, str]], bool]:
    """Output CSV → row dicts, csvtojson-style (all values strings).

    Returns ``(rows, truncated)``: reading stops after ``max_rows`` so a
    huge output can't be materialized into one JSON response (the
    ``truncated`` flag tells the client; below the cap the payload is
    byte-identical to the reference's whole-table response)."""
    import csv

    rows: list[dict[str, str]] = []
    truncated = False
    with open(path, newline="", encoding="utf-8") as f:
        for r in csv.DictReader(f):
            if len(rows) >= max_rows:
                truncated = True
                break
            rows.append(dict(r))
    return rows, truncated


class EtlServer:
    """One SparkSession serving the reference's three endpoints."""

    def __init__(
        self,
        workdir: str,
        spark: SparkSession | None = None,
        timeout_sec: float = DEFAULT_TIMEOUT_SEC,
        port: int = 0,
    ) -> None:
        self.workdir = os.path.abspath(workdir)
        self.spark = spark or get_spark(app_name="etl-server")
        self.timeout_sec = timeout_sec
        os.makedirs(os.path.join(self.workdir, "data"), exist_ok=True)
        # /run-etl requests share one staged-upload path, one output.csv
        # and the process-global cache registry (the reference isolates
        # each run in a fresh child process, server.js:43); serialize
        # them so concurrent uploads can't read each other's results or
        # release each other's caches mid-run
        self._etl_lock = threading.Lock()
        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), self._make_handler())
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    # -- request handling ---------------------------------------------------
    def _run_etl(self, filename: str | None, payload: bytes | None) -> dict[str, Any]:
        with self._etl_lock:
            return self._run_etl_locked(filename, payload)

    def _run_etl_locked(
        self, filename: str | None, payload: bytes | None
    ) -> dict[str, Any]:
        ext = os.path.splitext(filename or "")[1].lower().lstrip(".")
        file_type = ext if ext in ("csv", "json") else "txt"  # server.js:22-25
        cfg = default_config(self.workdir, file_type)
        if payload is not None:
            staged = os.path.join(self.workdir, "data", f"uploaded_input.{ext or 'txt'}")
            with open(staged, "wb") as f:
                f.write(payload)
            cfg = dict(cfg)
            cfg["extract"] = {**cfg["extract"], "type": file_type, "source": staged}

        out_csv = cfg["load"]["destination"]
        if os.path.exists(out_csv):  # stale-output overwrite, server.js:40-41
            os.unlink(out_csv)
        report = run_etl_pipeline(
            self.spark,
            cfg,
            schema_dir=os.path.join(self.workdir, "schemas"),
            timeout_sec=self.timeout_sec,
        )
        if report.cancelled:
            return {"success": False, "error": "ETL timed out."}  # server.js:47
        if not os.path.exists(out_csv):
            return {
                "success": False,
                "error": "No output produced.",
                "details": report.error or "",
            }
        schema = None
        schema_path = os.path.join(
            self.workdir, "schemas", f"{report.source_id}_schema.json"
        )
        if os.path.exists(schema_path):
            with open(schema_path, encoding="utf-8") as f:
                schema = json.load(f)
        table, truncated = _read_csv_rows(out_csv)
        # 'truncated' appears ONLY above the cap: below it the response
        # shape stays byte-identical to the reference's (server.js:52-70
        # has no such field; strict-schema clients must not see drift)
        resp: dict[str, Any] = {"success": True, "table": table, "schema": schema}
        if truncated:
            resp["truncated"] = True
        return resp

    def _make_handler(self) -> type[BaseHTTPRequestHandler]:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt: str, *args: Any) -> None:  # quiet tests
                pass

            def _json(self, obj: Any, status: int = 200) -> None:
                body = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self) -> None:
                if self.path.rstrip("/") != "/run-etl":
                    self._json({"error": "Not found."}, 404)
                    return
                try:
                    filename, payload = self._parse_upload()
                    self._json(server._run_etl(filename, payload))
                except Exception as err:  # server.js:71-73: error JSON, not 500
                    self._json({"success": False, "error": str(err)})

            def _parse_upload(self) -> tuple[str | None, bytes | None]:
                length = int(self.headers.get("Content-Length") or 0)
                ctype = self.headers.get("Content-Type") or ""
                if length == 0 or "multipart/form-data" not in ctype:
                    return None, None
                body = self.rfile.read(length)
                msg = BytesParser(policy=_email_policy).parsebytes(
                    f"Content-Type: {ctype}\r\n\r\n".encode() + body
                )
                for part in msg.iter_parts():
                    disp = part.get("Content-Disposition", "")
                    if 'name="inputFile"' in disp:
                        return part.get_filename(), part.get_payload(decode=True)
                return None, None

            def _static(self, body: str, ctype: str) -> None:
                data = body.encode()
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self) -> None:
                if self.path.startswith("/schema/"):
                    source_id = self.path[len("/schema/") :].strip("/")
                    if not _SOURCE_ID_RE.fullmatch(source_id):
                        self._json({"error": "Schema not found."}, 404)
                        return
                    path = os.path.join(
                        server.workdir, "schemas", f"{source_id}_schema.json"
                    )
                    if not os.path.exists(path):  # server.js:78-81
                        self._json({"error": "Schema not found."}, 404)
                        return
                    with open(path, encoding="utf-8") as f:
                        self._json(json.load(f))
                elif self.path.rstrip("/") in ("", "/index.html"):
                    self._static(frontend.INDEX_HTML, "text/html; charset=utf-8")
                elif self.path == "/table.js":
                    self._static(
                        frontend.TABLE_JS, "application/javascript; charset=utf-8"
                    )
                elif self.path.rstrip("/") == "/download":  # server.js:88-91
                    path = os.path.join(server.workdir, "data", "output.csv")
                    if not os.path.exists(path):
                        self._json({"error": "No output produced."}, 404)
                        return
                    with open(path, "rb") as f:
                        data = f.read()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/csv")
                    self.send_header(
                        "Content-Disposition",
                        'attachment; filename="structured_table.csv"',
                    )
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                else:
                    self._json({"error": "Not found."}, 404)

        return Handler

    # -- lifecycle ------------------------------------------------------------
    def start(self) -> None:
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def main() -> None:  # pragma: no cover — manual entry point
    import argparse

    ap = argparse.ArgumentParser(description="ETL engine HTTP server")
    ap.add_argument("--workdir", default=".")
    ap.add_argument("--port", type=int, default=5001)  # server.js:94
    args = ap.parse_args()
    srv = EtlServer(args.workdir, port=args.port)
    print(f"Backend running on http://localhost:{srv.port}")
    srv._httpd.serve_forever()


if __name__ == "__main__":
    main()
