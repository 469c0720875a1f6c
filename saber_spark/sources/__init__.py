from saber_spark.sources.tables import TABLES, load_table, load_tables, register_views
from saber_spark.sources.transcripts import (
    TRANSCRIPTS_CTE,
    derive_transcripts,
    synthesize_transcripts,
    with_transcripts_oracle,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "TRANSCRIPTS_CTE",
    "derive_transcripts",
    "synthesize_transcripts",
    "with_transcripts_oracle",
]
