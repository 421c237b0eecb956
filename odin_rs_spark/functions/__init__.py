from odin_rs_spark.functions.geo import (
    bearing_deg,
    ecef_x,
    ecef_y,
    ecef_z,
    feet_to_meters,
    haversine_km,
    knots_to_mps,
    meters_to_feet,
    quantize_cell,
)
from odin_rs_spark.functions.datetimes import (
    day_start,
    epoch_millis,
    from_epoch_millis,
    full_hour,
    minute_of_hour,
)
from odin_rs_spark.functions.text import (
    char_ngrams,
    norm_text,
    quality_features,
    token_count,
    tokens,
)

__all__ = [
    "bearing_deg",
    "char_ngrams",
    "day_start",
    "ecef_x",
    "ecef_y",
    "ecef_z",
    "epoch_millis",
    "feet_to_meters",
    "from_epoch_millis",
    "full_hour",
    "haversine_km",
    "knots_to_mps",
    "meters_to_feet",
    "minute_of_hour",
    "norm_text",
    "quality_features",
    "quantize_cell",
    "token_count",
    "tokens",
]
