"""User-facing engine facade: one object that exposes everything the
reference's user could do, plus the extended query surface.

- ``Engine.sql("SELECT ...")`` — full Spark SQL over the star-schema
  tables registered as temp views (region/nation/customer/supplier/
  part/orders/lineitem/events/documents/embeddings).
- ``Engine.query(name)`` — any operator from the registry
  (``Engine.queries()`` lists them), returned as a lazy DataFrame.
- ``Engine.run_etl(cfg)`` — the reference's config-driven
  extract→normalize→flatten→schema→CSV lifecycle
  (see ``pipeline.run_etl_pipeline``).
- ``Engine.profile(df)`` / ``Engine.schema_artifact(df)`` — the
  schema-inference surface on any DataFrame.

The facade holds no state beyond the SparkSession and the data
directory; every result is a lazy plan until the caller acts on it.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_project_auraverse_spark.operators.schema_profile import (
    generate_schema,
    profile_table,
)
from etl_pipeline_project_auraverse_spark.pipeline import RunReport, run_etl_pipeline
from etl_pipeline_project_auraverse_spark.session import get_spark, load_table

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


class Engine:
    def __init__(
        self,
        sf_dir: str,
        spark: SparkSession | None = None,
        register_views: bool = True,
    ) -> None:
        self.spark = spark or get_spark(app_name="engine")
        self.sf_dir = sf_dir
        if register_views:
            self.register_views()

    # -- tables & SQL -------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def register_views(self) -> list[str]:
        """Expose every star-schema table as a temp view for spark.sql,
        plus the engine's table-valued functions (word_ngrams,
        structured_blocks)."""
        registered = []
        import os

        for t in TABLES:
            if os.path.exists(os.path.join(self.sf_dir, f"{t}.parquet")):
                self.table(t).createOrReplaceTempView(t)
                registered.append(t)
        from etl_pipeline_project_auraverse_spark.functions.udtfs import register_udtfs

        register_udtfs(self.spark)
        return registered

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def read(self, path: str, **kwargs) -> DataFrame:
        """Extension-routed lazy read (csv/json/parquet/orc/arrow/
        feather/text), the generalized S14 dispatch."""
        from etl_pipeline_project_auraverse_spark.sources.tabular import read_table

        return read_table(self.spark, path, **kwargs)

    def save(
        self,
        df: DataFrame,
        path: str,
        fmt: str = "parquet",
        partition_by: list[str] | None = None,
    ) -> None:
        """Scale-path partitioned write (every executor writes its own
        part files; ``partition_by`` enables downstream pruning)."""
        from etl_pipeline_project_auraverse_spark.sources.tabular import (
            write_partitioned,
        )

        write_partitioned(df, path, fmt=fmt, partition_by=partition_by)

    # -- registry queries ---------------------------------------------------
    @staticmethod
    def queries() -> list[str]:
        from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all

        load_all()
        return sorted(QUERIES)

    def query(self, name: str) -> DataFrame:
        from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all

        load_all()
        if name not in QUERIES:
            raise KeyError(f"unknown query {name!r}; see Engine.queries()")
        return QUERIES[name](self.spark, self.sf_dir)

    # -- ETL lifecycle ------------------------------------------------------
    def run_etl(self, cfg: dict[str, Any], schema_dir: str = "schemas") -> RunReport:
        return run_etl_pipeline(self.spark, cfg, schema_dir=schema_dir)

    # -- profiling ----------------------------------------------------------
    def profile(self, df: DataFrame) -> list[dict[str, Any]]:
        return profile_table(df)

    def schema_artifact(self, df: DataFrame) -> dict[str, Any]:
        return generate_schema(df)

    # -- CDC / MERGE upsert -------------------------------------------------
    def apply_changes(
        self,
        changes: DataFrame,
        keys: list[str],
        seq_cols: list[str],
        op_col: str | None = None,
        delete_op: str = "D",
    ) -> DataFrame:
        """Collapse a change feed to latest state per key (see
        ``operators/cdc.apply_changes``)."""
        from etl_pipeline_project_auraverse_spark.operators.cdc import apply_changes

        return apply_changes(changes, keys, seq_cols, op_col, delete_op)

    def merge_snapshot(
        self,
        base: DataFrame,
        changes: DataFrame,
        keys: list[str],
        seq_cols: list[str],
        op_col: str | None = None,
        delete_op: str = "D",
    ) -> DataFrame:
        """Advance a snapshot by one change batch — MERGE INTO shape,
        idempotent on re-application (``operators/cdc.merge_snapshot``)."""
        from etl_pipeline_project_auraverse_spark.operators.cdc import merge_snapshot

        return merge_snapshot(base, changes, keys, seq_cols, op_col, delete_op)

    # -- layout / sketches --------------------------------------------------
    def zorder_by(self, df: DataFrame, cols: list[str], n_files: int = 64,
                  bits: int = 8) -> DataFrame:
        """Cluster ``df`` on the Morton (Z-order) curve of ``cols`` so a
        subsequent write yields files with tight min/max envelopes in
        EVERY listed column (``operators/zorder``). Numeric columns are
        quantized against their global min/max (one 1-row broadcast)."""
        from pyspark.sql import functions as F

        from etl_pipeline_project_auraverse_spark.operators.zorder import (
            quantize,
            zorder_key,
            zorder_layout,
        )

        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
        stats = df.agg(*aggs)
        quantized = [
            quantize(F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits)
            for c in cols
        ]
        clustered = zorder_layout(
            df.crossJoin(F.broadcast(stats)), zorder_key(quantized, bits), n_files
        )
        return clustered.drop(*[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])

    def hilbert_by(self, df: DataFrame, cols: list[str], n_files: int = 64,
                   bits: int = 8) -> DataFrame:
        """Cluster ``df`` on the Hilbert curve of two ``cols`` — same
        contract as :meth:`zorder_by` with tighter average envelopes
        (every curve step is Manhattan-adjacent; see
        ``q_layout_pruning_compare`` for the measured difference)."""
        from pyspark.sql import functions as F

        from etl_pipeline_project_auraverse_spark.operators.zorder import (
            hilbert_key,
            quantize,
            zorder_layout,
        )

        if len(cols) != 2:
            raise ValueError("hilbert_by clusters exactly two columns")
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
        stats = df.agg(*aggs)
        keyed = hilbert_key(
            df.crossJoin(F.broadcast(stats)),
            quantize(F.col(cols[0]), F.col(f"__mn_{cols[0]}"),
                     F.col(f"__mx_{cols[0]}"), bits),
            quantize(F.col(cols[1]), F.col(f"__mn_{cols[1]}"),
                     F.col(f"__mx_{cols[1]}"), bits),
            bits,
        )
        clustered = zorder_layout(keyed, F.col("hkey"), n_files)
        return clustered.drop(
            "hkey", *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
        )

    def approx_quantiles(self, df: DataFrame, col: str,
                         probs: list[float],
                         group_col: str | None = None) -> DataFrame:
        """One-scan t-digest quantiles (``operators/tdigest``) — the
        sketch path for monitoring/binning; use the exact
        order-statistics operator when the result must be
        oracle-exact."""
        from etl_pipeline_project_auraverse_spark.operators.tdigest import (
            tdigest_quantiles,
        )

        return tdigest_quantiles(df, col, probs, group_col=group_col)

    def heavy_hitters(self, df: DataFrame, col: str, phi: float,
                      k: int | None = None) -> DataFrame:
        """Exact counts of values of ``col`` occurring in ≥ ``phi`` of
        rows, via the Misra–Gries sketch + recount two-pass
        (``operators/heavy_hitters``). ``k`` defaults to 2/phi so the
        sketch containment bound (phi > 1/k) holds with slack."""
        from pyspark.sql import functions as F

        from etl_pipeline_project_auraverse_spark.operators.heavy_hitters import (
            exact_heavy_hitters,
        )

        if k is None:
            k = int(2.0 / phi)
        if phi <= 1.0 / k:
            raise ValueError(f"phi={phi} must exceed 1/k={1.0 / k}")
        threshold = df.agg(
            (F.count(F.lit(1)) * F.lit(phi)).alias("threshold")
        )
        return exact_heavy_hitters(df, col, k, threshold)

    # -- plan inspection ----------------------------------------------------
    def explain(self, df_or_name: DataFrame | str) -> dict[str, Any]:
        """Plan-quality report for a DataFrame or a named registry
        query: formatted physical plan plus the lint summary the plan
        tests enforce (cartesian products, broadcast joins, shuffle
        count, pushed filters, scanned columns, unpartitioned
        windows) — the 100 TB checklist as a user API."""
        from etl_pipeline_project_auraverse_spark.plans import inspect as PI

        df = (
            self.query(df_or_name)
            if isinstance(df_or_name, str)
            else df_or_name
        )
        rep = PI.lint_plan(df)
        return {
            "plan": PI.physical_plan(df),
            "cartesian": rep.cartesian,
            "broadcast_joins": rep.broadcast_joins,
            "shuffle_exchanges": rep.shuffle_exchanges,
            "pushed_filters": rep.pushed_filters,
            "scan_columns": sorted(rep.scan_columns),
            "unpartitioned_windows": rep.unpartitioned_windows,
        }

    # -- versioned tables ---------------------------------------------------
    def versioned(self, root: str):
        """Snapshot-versioned parquet table with time travel
        (``operators/versioned.VersionedTable``)."""
        from etl_pipeline_project_auraverse_spark.operators.versioned import (
            VersionedTable,
        )

        return VersionedTable(root)

    # -- privacy ------------------------------------------------------------
    def scrub_pii(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        """Per-class PII counts + a ``text_scrubbed`` redaction column
        (``functions/pii``: regexp batteries + expression-level Luhn
        card validation; pure codegen, no UDFs)."""
        from pyspark.sql import functions as F

        from etl_pipeline_project_auraverse_spark.functions.pii import (
            PATTERNS,
            luhn_valid_count,
            pii_count,
            redact,
        )

        col = F.col(text_col)
        counts = [
            pii_count(col, k).alias(f"{k}_count")
            for k in PATTERNS
            if k != "card_candidate"
        ]
        return df.select(
            "*",
            *counts,
            luhn_valid_count(col).alias("card_count"),
            redact(col).alias("text_scrubbed"),
        )

    # -- graph --------------------------------------------------------------
    def bfs(
        self,
        edges: DataFrame,
        seeds: DataFrame,
        max_hops: int,
        checkpoint_every: int = 4,
    ) -> DataFrame:
        """Minimum hop distances from ``seeds`` (column ``node``) over
        ``edges`` (columns ``u``, ``v``), lineage-truncated for
        arbitrary depth (``operators/graph_traversal``)."""
        from etl_pipeline_project_auraverse_spark.operators.graph_traversal import (
            bfs_min_hops,
        )

        return bfs_min_hops(edges, seeds, max_hops, checkpoint_every)

    def lpa(
        self,
        edges: DataFrame,
        rounds: int,
        checkpoint_every: int = 4,
        assume_symmetric: bool = False,
    ) -> DataFrame:
        """Deterministic weighted label-propagation communities over
        an (u, v, w) edge table: (u, lab) after ``rounds`` synchronous
        updates — highest incident weight wins, smallest label on
        ties. Directed tables are safe by default (out-only nodes keep
        their label each round); if you symmetrized the table yourself
        pass ``assume_symmetric=True`` to skip the per-round
        carry-forward join (same answer, ~rounds fewer joins)."""
        from etl_pipeline_project_auraverse_spark.operators.label_propagation import (
            lpa_labels,
        )

        return lpa_labels(edges, rounds, checkpoint_every, assume_symmetric)

    # -- statistical tests --------------------------------------------------
    def spearman(self, df: DataFrame, cols: list[str]) -> DataFrame:
        """Pairwise Spearman rank correlations (one row per pair:
        ``col_x, col_y, rho``) via scale-safe tie-averaged ranks
        (``operators/stats_tests``)."""
        from etl_pipeline_project_auraverse_spark.operators.stats_tests import (
            spearman,
        )

        return spearman(df, cols)

    def ks_test(
        self, df: DataFrame, value_col: str, flag_col: str
    ) -> DataFrame:
        """Exact two-sample Kolmogorov-Smirnov statistic between rows
        with ``flag_col`` = 1 and = 0 — the distribution-drift gate.
        One row: ``n_a, n_b, ks_stat, ks_at_value``."""
        from etl_pipeline_project_auraverse_spark.operators.stats_tests import (
            ks_2sample,
        )

        return ks_2sample(df, value_col, flag_col)

    def mwu_test(
        self, df: DataFrame, value_col: str, flag_col: str
    ) -> DataFrame:
        """Tie-corrected Mann-Whitney U (rank-sum) test. One row:
        ``n_a, n_b, u_stat, z_score``."""
        from etl_pipeline_project_auraverse_spark.operators.stats_tests import (
            mann_whitney,
        )

        return mann_whitney(df, value_col, flag_col)

    def chi2_test(self, df: DataFrame, x_col: str, y_col: str) -> DataFrame:
        """Chi-squared independence over the ``x_col`` × ``y_col``
        contingency table. One row: ``chi2, dof, n_rows``."""
        from etl_pipeline_project_auraverse_spark.operators.stats_tests import (
            chi2_independence,
        )

        return chi2_independence(df, x_col, y_col)

    def welch_test(
        self, df: DataFrame, value_col: str, flag_col: str, scale: int = 100
    ) -> DataFrame:
        """Welch's unequal-variance t-test between rows with
        ``flag_col`` = 1 and = 0 (``value_col`` × ``scale`` must be
        integral for exact sufficient statistics). One row:
        ``n_a, n_b, mean_a, mean_b, t_stat, dof``."""
        from etl_pipeline_project_auraverse_spark.operators.stats_tests import (
            welch_ttest,
        )

        return welch_ttest(df, value_col, flag_col, scale)

    def anova_test(
        self, df: DataFrame, value_col: str, group_col: str, scale: int = 100
    ) -> DataFrame:
        """One-way ANOVA F of ``value_col`` across ``group_col``
        groups. One row: ``k, n_total, f_stat``."""
        from etl_pipeline_project_auraverse_spark.operators.stats_tests import (
            anova_f,
        )

        return anova_f(df, value_col, group_col, scale)

    def auc(self, df: DataFrame, score_col: str, label_col: str) -> DataFrame:
        """Exact ROC-AUC of a score column against binary labels via
        the rank-sum identity. One row: ``n_pos, n_neg, auc``."""
        from etl_pipeline_project_auraverse_spark.operators.stats_tests import (
            roc_auc,
        )

        return roc_auc(df, score_col, label_col)

    # -- multimodal ---------------------------------------------------------
    def decode_images(self, df: DataFrame) -> DataFrame:
        """Dimensions + mean pixel for every decodable image payload
        (BMP/PNG incl. Adam7/GIF/baseline JPEG via the from-scratch
        codecs); undecodable rows are dropped (quarantine policy)."""
        from etl_pipeline_project_auraverse_spark.operators.multimodal import (
            decode_images,
        )

        return decode_images(df)

    def video_metadata(self, df: DataFrame) -> DataFrame:
        """Per-track MP4 metadata (duration, geometry, codec fourcc,
        sample count, implied fps) from the stdlib ISO-BMFF box parser;
        non-MP4 payloads are dropped (quarantine policy)."""
        from etl_pipeline_project_auraverse_spark.operators.mp4_meta import (
            video_metadata,
        )

        return video_metadata(df)

    def sample_video_frames(self, df: DataFrame, every_n: int = 2) -> DataFrame:
        """Decode-free MP4 frame-timeline sampling: every Nth video
        sample's index, start time, and byte size from stts/stsz —
        the work plan a real decode stage executes."""
        from etl_pipeline_project_auraverse_spark.operators.mp4_meta import (
            sample_mp4_frames,
        )

        return sample_mp4_frames(df, every_n=every_n)

    def hybrid_search(self, sf_dir: str) -> DataFrame:
        """BM25 + embedding-cosine reciprocal-rank fusion over the
        documents/embeddings tables (the registered
        ``q_hybrid_search_rrf`` plan)."""
        from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all

        load_all()
        return QUERIES["q_hybrid_search_rrf"](self.spark, sf_dir)
