from week5_datingnlp_big_data_spark.functions.text import (  # noqa: F401
    HTML_PAT,
    CUSTOM_STOP_PAT,
    clean_html,
    remove_custom_stopwords,
    tokenize,
    remove_stopwords,
    filter_min_length,
)
from week5_datingnlp_big_data_spark.functions.stemmer import stem_tokens, porter2_stem  # noqa: F401
