"""Schemas for the BPI pipeline (SURVEY.md §1, FIXTURES.md).

The raw payload schema mirrors the CoinDesk BPI ``currentprice.json``
document as consumed by the reference (field accesses at
bpi_crawler.py:68,102-117); the enriched schema is the fixed 16-column
record built at bpi_crawler.py:101-118 with column order from the sink
projection at bpi_crawler.py:172.

The ``bpi_gdp_*`` column names intentionally preserve the reference's
GBP→"gdp" misspelling (bpi_crawler.py:107-109) — it is the declared
output schema, not a typo to fix.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _ccy_struct() -> T.StructType:
    return T.StructType(
        [
            T.StructField("code", T.StringType()),
            T.StructField("rate", T.StringType()),  # comma-grouped decimal string
            T.StructField("description", T.StringType()),
        ]
    )


# Fixed-struct encoding (exactly the fields the reference touches).
BPI_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField(
            "time",
            T.StructType(
                [
                    T.StructField("updated", T.StringType()),
                    T.StructField("updatedISO", T.StringType()),
                ]
            ),
        ),
        T.StructField("disclaimer", T.StringType()),
        T.StructField("chartName", T.StringType()),
        T.StructField(
            "bpi",
            T.StructType(
                [
                    T.StructField("USD", _ccy_struct()),
                    T.StructField("GBP", _ccy_struct()),
                    T.StructField("EUR", _ccy_struct()),
                ]
            ),
        ),
    ]
)

# General N-currency encoding (map keyed by currency code); accepted by
# flatten_payload via the map access path.
BPI_PAYLOAD_MAP_SCHEMA = T.StructType(
    [
        BPI_PAYLOAD_SCHEMA["time"],
        BPI_PAYLOAD_SCHEMA["disclaimer"],
        BPI_PAYLOAD_SCHEMA["chartName"],
        T.StructField("bpi", T.MapType(T.StringType(), _ccy_struct())),
    ]
)

# FX rates dimension replacing the live convert API (FIXTURES.md §2).
FX_RATES_SCHEMA = T.StructType(
    [
        T.StructField("from_ccy", T.StringType()),
        T.StructField("to_ccy", T.StringType()),
        T.StructField("rate_date", T.DateType()),
        T.StructField("rate", T.DoubleType()),
    ]
)

# Sink column order (bpi_crawler.py:172 / dump_with_postgres.py:160).
ENRICHED_COLUMNS = [
    "job_id",
    "disclaimer",
    "chart_name",
    "bpi_usd_code",
    "bpi_usd_rate_float",
    "bpi_usd_description",
    "bpi_gdp_code",
    "bpi_gdp_rate_float",
    "bpi_gdp_description",
    "bpi_eur_code",
    "bpi_eur_rate_float",
    "bpi_eur_description",
    "bpi_idr_rate_float",
    "time_updated",
    "time_updated_iso",
    "last_updated",
]
