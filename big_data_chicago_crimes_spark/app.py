"""CrimesAnalytics — the reference application's query surface, Spark-first.

One class, one method per reference query, so a user of
``gaianicolazzo/Big-Data-Chicago-Crimes`` can switch engines and run
every query they run today. Differences from the reference by design:

- every method RETURNS a DataFrame (compute and presentation separated;
  the reference interleaves seaborn/Streamlit rendering — Dataset.py:173-541);
- memoization is one ``cached()`` utility keyed by a result name under
  ``cache_dir`` (replaces 12 hand-rolled ``file_exists`` blocks,
  Dataset.py:50-56 et al.), opt-in via ``cache_dir=None``;
- reference bugs are fixed, with the divergence noted per method;
- no ``collect()``/``toPandas()`` inside any method — callers render.

Method ↔ reference mapping (all citations into /root/reference/src/modules/Dataset.py):

| method                    | reference                 | file:line |
| ------------------------- | ------------------------- | --------- |
| critical_hours            | showCriticalHour          | 173-198   |
| counts_by_primary_type    | showPlotPrimaryType       | 201-238   |
| dtype_census              | (dtype pie)               | 241-258   |
| district_centroids        | crime_map prep            | 261-294   |
| district_counts           | show_district             | 339-371   |
| season_pivot              | show_season               | 374-430   |
| arrest_percentage         | show_perc_arrests         | 458-469   |
| common_crime_locations    | show_common_crimes_location | 472-498 |
| violent_area_counts       | show_area_violent_crimes  | 502-513   |
| moving_average            | show_moving_average       | 516-541   |
| prediction_histogram      | hist_arrests              | 543-561   |
| logistic_regression_auc   | logisticregression        | 563-682   |
| random_forest_auc         | random_forest_arrests     | 685-789   |
| gbt_rmse                  | grandient_boosting_crimines | 792-863 |
| correlation_matrix        | correlation_matrix        | 865-891   |
| kmeans_district_clusters  | crime_map KMeans          | 280-294   |
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators import ml as ml_ops
from big_data_chicago_crimes_spark.operators.aggregates import (
    count_by,
    count_then_max,
    distinct_values,
    grouped_stats,
    pivot_counts,
    ratio_of,
    top_k,
)
from big_data_chicago_crimes_spark.operators.cleaning import add_season, clean_crimes
from big_data_chicago_crimes_spark.operators.windows import moving_average
from big_data_chicago_crimes_spark.sources.sinks import cached

VIOLENT_TYPES = ["HOMICIDE", "ASSAULT", "ROBBERY"]  # Dataset.py:507
SEASONS = ["Winter", "Spring", "Summer", "Autumn"]


class CrimesAnalytics:
    """Analytics over a cleaned crimes fact table (CRIMES_CLEAN shape,
    schemas.py). Construct from a raw extract via ``from_raw``."""

    def __init__(self, df_cleaned: DataFrame, cache_dir: str | None = None):
        self.df = df_cleaned
        self.df_arrested = df_cleaned.filter(F.col("Arrest") == 1)  # Dataset.py:121
        self.df_season = add_season(df_cleaned)  # Dataset.py:123-129
        self._cache_dir = cache_dir

    @classmethod
    def from_raw(cls, raw: DataFrame, cache_dir: str | None = None) -> "CrimesAnalytics":
        """Apply the full reference ETL (Dataset.py:83-145, bugs fixed)."""
        return cls(clean_crimes(raw), cache_dir=cache_dir)

    def _cached(self, name: str, build) -> DataFrame:
        if self._cache_dir is None:
            return build()
        return cached(self.df.sparkSession, f"{self._cache_dir}/{name}.parquet", build)

    # --- interactive queries -------------------------------------------

    def critical_hours(self) -> DataFrame:
        """Max per-type crime count per hour among arrests
        (Dataset.py:180-181). Output column named ``max_cnt`` (the
        reference's dict-agg emits the literal name ``max(count)``)."""
        return self._cached(
            "critical_hours",
            lambda: count_then_max(
                self.df_arrested, ["hour", "Primary Type"], ["hour"]
            ).orderBy("hour"),
        )

    def counts_by_primary_type(self) -> DataFrame:
        """Crime counts per category, descending (Dataset.py:214)."""
        return self._cached(
            "counts_by_primary_type",
            lambda: count_by(self.df, "Primary Type", name="Count").orderBy(
                F.col("Count").desc(), F.col("Primary Type")
            ),
        )

    def distinct_primary_types(self) -> DataFrame:
        """Distinct categories (Dataset.py:210)."""
        return distinct_values(self.df, "Primary Type")

    def dtype_census(self) -> DataFrame:
        """Column-type census (the reference counts dtypes driver-side
        with collections.Counter — Dataset.py:249-256; here it's a tiny
        literal DataFrame derived from the schema)."""
        from collections import Counter

        counts = Counter(t for _, t in self.df.dtypes)
        return self.df.sparkSession.createDataFrame(
            sorted(counts.items()), "dtype string, n_columns int"
        )

    def district_counts(self) -> DataFrame:
        """Crimes per district (Dataset.py:344)."""
        return self._cached(
            "district_counts", lambda: count_by(self.df, "District").orderBy("District")
        )

    def district_centroids(self) -> DataFrame:
        """Per-(district, type) count + mean coordinates — the map-layer
        input (Dataset.py:272-276)."""
        return grouped_stats(
            self.df,
            ["District", "Primary Type"],
            {
                "cnt": F.count("*"),
                "avg_lat": F.avg("Latitude"),
                "avg_lon": F.avg("Longitude"),
            },
        )

    def season_pivot(self) -> DataFrame:
        """year × season crime matrix with seeded pivot values + fillna 0
        (Dataset.py:382-390)."""
        return self._cached(
            "season_pivot",
            lambda: pivot_counts(self.df_season, "year", "season", SEASONS).orderBy(
                "year"
            ),
        )

    def arrest_percentage(self) -> DataFrame:
        """Global arrest rate, one row (Dataset.py:463-465)."""
        return ratio_of(self.df, F.col("Arrest") == 1)

    def common_crime_locations(self, k: int = 10) -> DataFrame:
        """Top-k location descriptions (Dataset.py:477)."""
        return self._cached(
            f"common_crime_locations_{k}",
            lambda: top_k(self.df, ["Location Description"], k),
        )

    def violent_area_counts(self, k: int = 10) -> DataFrame:
        """Top-k community areas for violent crime (Dataset.py:507-509)."""
        violent = self.df.filter(F.col("Primary Type").isin(VIOLENT_TYPES))
        return self._cached(
            f"violent_area_counts_{k}", lambda: top_k(violent, ["Community Area"], k)
        )

    def moving_average(self, window_months: int = 3) -> DataFrame:
        """Trailing moving average of monthly counts — the INTENDED
        semantics of show_moving_average (Dataset.py:521-523 partitions
        by the grouping keys, so its frame always holds one row; see
        SURVEY.md §2.5)."""
        monthly = count_by(self.df, "year", "month", name="Crimes_count")
        return self._cached(
            f"moving_average_{window_months}",
            lambda: moving_average(
                monthly, ["year", "month"], "Crimes_count", window_months
            ).orderBy("year", "month"),
        )

    # --- ML pipelines (seeded; reference §2.11 bugs fixed) -------------

    def prediction_histogram(self, predictions: DataFrame, label_col: str = "Arrest") -> DataFrame:
        """Correct/incorrect prediction counts (hist_arrests,
        Dataset.py:543-561)."""
        correct = (F.col("prediction") == F.col(label_col)).cast("int").alias("Correct")
        return predictions.select(correct).groupBy("Correct").count()

    def logistic_regression_auc(self) -> DataFrame:
        """LR on Arrest (Dataset.py:563-682): fit-then-transform pipeline."""
        return ml_ops.logistic_regression_auc(self._ml_frame(), "Arrest")

    def random_forest_auc(self) -> DataFrame:
        return ml_ops.random_forest_auc(self._ml_frame(), "Arrest")

    def gbt_rmse(self) -> DataFrame:
        """GBT regression on the (District, year, month, day) count series
        (Dataset.py:800: the model trains on a pre-aggregated table)."""
        daily = self.df.groupBy("District", "year", "month", "day").agg(
            F.count("*").cast("double").alias("Crimes_count")
        )
        return ml_ops.gbt_regression_rmse(daily, "Crimes_count")

    def kmeans_district_clusters(self, k: int = 3) -> DataFrame:
        """KMeans k=3 seed=0 over per-district counts (Dataset.py:280-294)."""
        per_district = self.df.groupBy("District").agg(
            F.count("*").cast("double").alias("cnt")
        )
        return ml_ops.kmeans_cluster_sizes(per_district, ["cnt"], k=k)

    def district_cluster_assignments(self, k: int = 3) -> DataFrame:
        """(District, cnt, cluster) — the crime_map coloring input
        (Dataset.py:291-312): feed `{District: cluster}` into
        geo.districts_to_geojson + geo.write_html_map for the reference's
        cluster-colored district map."""
        per_district = self.df.groupBy("District").agg(
            F.count("*").cast("double").alias("cnt")
        )
        return ml_ops.kmeans_assign(per_district, ["cnt"], k=k)

    def correlation_matrix(self) -> DataFrame:
        """Pearson matrix over the numeric columns (Dataset.py:865-891;
        the reference's empty-select bug made it numeric-only — here
        that's the documented intent)."""
        numeric = ml_ops.numeric_columns(self.df, exclude=("ID",))
        return ml_ops.pearson_correlation_matrix(self.df, numeric)

    def _ml_frame(self) -> DataFrame:
        """Feature frame mirroring the reference's dtype-driven selection
        (drops id-like and timestamp columns — Dataset.py:573-579)."""
        drop = [c for c in ("ID", "Case Number", "Updated On") if c in self.df.columns]
        return self.df.drop(*drop)


# --- interactive shell (the reference's menu router, Dataset.py:893-938) ---
#
# The reference routes a Streamlit sidebar selectbox to one method per
# option. This is the dependency-free equivalent: the same option names,
# routed to the same analytics, as a testable pure dispatch plus a stdio
# REPL loop. Presentation stays out of the engine — each option returns a
# DataFrame and the shell renders via .show().

MENU: dict[str, str] = {
    "Critical hours": "critical_hours",
    "Crimes per category": "counts_by_primary_type",
    "Column dtypes": "dtype_census",
    "Crimes per district": "district_counts",
    "Season matrix": "season_pivot",
    "Arrest percentage": "arrest_percentage",
    "Common crime locations": "common_crime_locations",
    "Violent areas": "violent_area_counts",
    "Moving average": "moving_average",
    "Logistic regression": "logistic_regression_auc",
    "Random forest": "random_forest_auc",
    "Gradient boosting": "gbt_rmse",
    "KMeans clusters": "kmeans_district_clusters",
    "Correlation matrix": "correlation_matrix",
}


def run_option(analytics: CrimesAnalytics, option: str) -> DataFrame:
    """Route a menu option to its analytics method (pure dispatch —
    raises KeyError on an unknown option, returns the DataFrame)."""
    return getattr(analytics, MENU[option])()


def main_menu(analytics: CrimesAnalytics, input_fn=input, print_fn=print) -> None:
    """Numbered-option REPL over ``MENU``. ``input_fn``/``print_fn`` are
    injectable so tests drive the loop without a tty. 'q' exits."""
    options = list(MENU)
    while True:
        for i, name in enumerate(options, 1):
            print_fn(f"{i:2d}. {name}")
        choice = input_fn("option (q to quit): ").strip().lower()
        if choice in ("q", "quit", "exit"):
            return
        if not choice.isdigit() or not 1 <= int(choice) <= len(options):
            print_fn(f"unknown option {choice!r}")
            continue
        df = run_option(analytics, options[int(choice) - 1])
        print_fn(df._jdf.showString(20, 40, False))
