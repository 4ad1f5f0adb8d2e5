from .cleaning import (  # noqa: F401
    decimal_guard,
    lenient_amount,
    lenient_timestamp,
    money,
    normalize_str,
    reason_codes,
    sentinel_to_null,
)
