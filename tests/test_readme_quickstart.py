"""The README quickstart must run exactly as printed — extracted from
the README at test time so doc drift fails CI, not a user."""

from __future__ import annotations

import re


def test_quickstart_snippet_runs_as_is(spark, tmp_path, monkeypatch):
    text = open("README.md", encoding="utf-8").read()
    blocks = re.findall(r"```python\n(.*?)```", text, flags=re.S)
    assert blocks, "README lost its quickstart python block"
    snippet = blocks[0]
    assert "Engine(" in snippet and "run_etl" in snippet
    # run in an isolated cwd so the snippet's relative fixture path and
    # /tmp outputs stay hermetic; reuse the test session via a shim
    monkeypatch.chdir("/root/repo")
    import etl_pipeline_project_auraverse_spark.engine as engine_mod

    orig_init = engine_mod.Engine.__init__

    def patched(self, sf_dir, spark_session=None, register_views=True, **kw):
        orig_init(self, sf_dir, spark=spark, register_views=register_views)

    monkeypatch.setattr(engine_mod.Engine, "__init__", patched)
    snippet = snippet.replace("/tmp/etl_out", str(tmp_path / "etl_out"))
    exec(compile(snippet, "README-quickstart", "exec"), {})
