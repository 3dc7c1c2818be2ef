from ironman_medallion_lakehouse_spark.functions.scalar import (  # noqa: F401
    athlete_natural_key,
    normalize_dash_to_null,
    parse_division,
    parse_time_to_seconds,
    split_person_name,
    surrogate_key,
)
