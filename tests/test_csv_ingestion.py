"""S1 CSV ingestion end-to-end: raw crimes CSV → explicit-schema scan →
cleaning ETL → a reference query, mirroring the reference's cold path
(Dataset.py:77-170) without schema inference."""

from __future__ import annotations

import csv

from big_data_chicago_crimes_spark.app import CrimesAnalytics
from big_data_chicago_crimes_spark.schemas import CRIMES_RAW_SCHEMA
from big_data_chicago_crimes_spark.sources.readers import read_csv

HEADER = [f.name for f in CRIMES_RAW_SCHEMA.fields]


def _write_csv(path):
    rows = [
        # ID, Case Number, Date, Block, IUCR, Primary Type, Description,
        # Location Description, Arrest, Domestic, Beat, District, Ward,
        # Community Area, FBI Code, X, Y, Year, Updated On, Lat, Lon, Location
        [1, "HY1", "07/04/2016 01:30:00 PM", "001XX", "0110", "THEFT",
         "OVER-$500", "STREET", "true", "false", 111, 1, 1, 10, "06",
         1100000.0, 1900000.0, 2016, "01/01/2017", 41.7, -87.6, "(41.7, -87.6)"],
        [2, "HY2", "03/15/2020 09:00:00 AM", "002XX", "0220", "ASSAULT",
         "AGG:PO", "APARTMENT", "false", "true", 222, 2, 2, 20, "04A",
         1100001.0, 1900001.0, 2020, "01/01/2021", 41.8, -87.7, "(41.8, -87.7)"],
    ]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        w.writerows(rows)


def test_csv_cold_path(spark, tmp_path):
    csv_path = str(tmp_path / "crimes.csv")
    _write_csv(csv_path)
    raw = read_csv(spark, csv_path, CRIMES_RAW_SCHEMA)
    # explicit schema, no inference pass: types are declared
    assert dict(raw.dtypes)["Arrest"] == "boolean"
    assert raw.count() == 2

    analytics = CrimesAnalytics.from_raw(raw)
    counts = {r["Primary Type"]: r.Count for r in analytics.counts_by_primary_type().collect()}
    assert counts == {"THEFT": 1, "ASSAULT": 1}
    row = analytics.df.filter("ID = 1").collect()[0]
    assert (row.year, row.hour, row.Arrest, row.Domestic) == (2016, 13, 1, 0)


def test_csv_short_row_dropped_by_cleaning(spark, tmp_path):
    # schema-checked scan: a short row fills missing columns with nulls,
    # which the cleaning pipeline's dropna removes
    p = str(tmp_path / "short.csv")
    with open(p, "w") as f:
        f.write(",".join(HEADER) + "\n")
        f.write("3,HY3,07/04/2016 01:30:00 PM\n")
    raw = read_csv(spark, p, CRIMES_RAW_SCHEMA)
    assert raw.count() == 1
    assert CrimesAnalytics.from_raw(raw).df.count() == 0
