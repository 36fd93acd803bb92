from .intervals import to_start_of_interval, to_start_of_interval_epoch  # noqa: F401
from .timeparse import (  # noqa: F401
    REF_DATETIME_FMT,
    REF_DATE_FMT,
    format_ref_datetime,
    parse_ref_date,
    parse_ref_datetime,
)
from .topk import approx_top_k, top_k_per_group  # noqa: F401
from .signed import signed, signed_volume  # noqa: F401
