"""Catalog — import all query modules so their ``@query`` registrations run,
and expose the driver-contract dicts."""

from __future__ import annotations

from tts_data_pipeline_spark.plans import registry

# Import for registration side effects.
from tts_data_pipeline_spark.plans import tpch  # noqa: F401

try:  # modules added incrementally; keep catalog importable mid-build
    from tts_data_pipeline_spark.plans import relational  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from tts_data_pipeline_spark.plans import scalarfuncs  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from tts_data_pipeline_spark.plans import windows  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from tts_data_pipeline_spark.plans import extensions  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from tts_data_pipeline_spark.plans import textops  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from tts_data_pipeline_spark.plans import coverage  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from tts_data_pipeline_spark.plans import qcops  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from tts_data_pipeline_spark.plans import analytics  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from tts_data_pipeline_spark.plans import multimodalops  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from tts_data_pipeline_spark.plans import streamingops  # noqa: F401
except ImportError:  # pragma: no cover
    pass


def queries():
    return dict(registry.QUERIES)


def oracle_sql():
    return dict(registry.ORACLES)
