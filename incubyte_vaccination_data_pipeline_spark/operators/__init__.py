from incubyte_vaccination_data_pipeline_spark.operators.validate import (  # noqa: F401
    get_valid_records,
    to_warehouse,
    validate_types,
)
from incubyte_vaccination_data_pipeline_spark.operators.views import (  # noqa: F401
    country_view,
    dedup_latest,
    distinct_countries,
    register_country_views,
)
