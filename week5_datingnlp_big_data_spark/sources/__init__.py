from week5_datingnlp_big_data_spark.sources.catalog import (  # noqa: F401
    TABLES,
    load_table,
    register_views,
)
from week5_datingnlp_big_data_spark.sources.schemas import SCHEMAS, PROFILES_SCHEMA  # noqa: F401
