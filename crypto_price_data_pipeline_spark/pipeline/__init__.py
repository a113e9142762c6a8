from .schema import BPI_PAYLOAD_SCHEMA, ENRICHED_COLUMNS, FX_RATES_SCHEMA
from .flatten import flatten_payload
from .rates import join_idr_rate
from .validate import expectation_gate, ValidationError
from .pipeline import run_pipeline

__all__ = [
    "BPI_PAYLOAD_SCHEMA",
    "ENRICHED_COLUMNS",
    "FX_RATES_SCHEMA",
    "flatten_payload",
    "join_idr_rate",
    "expectation_gate",
    "ValidationError",
    "run_pipeline",
]
