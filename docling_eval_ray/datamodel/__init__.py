from .schema import (  # noqa: F401
    ALL_KINDS,
    FURNITURE_KINDS,
    MEDIA_KINDS,
    SPAN_STRUCT,
    SPAN_TYPE,
    documents_schema,
    predictions_schema,
)
