from . import (  # noqa: F401
    asof,
    components,
    dedup,
    multimodal,
    range_join,
    sampling,
    similarity,
    skew,
    text_analysis,
    textprep,
)
