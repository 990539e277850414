"""featurescreening_jl_spark — a brand-new PySpark-native feature-screening
and point-in-time feature-engineering engine with the capabilities of
cursorinsight/FeatureScreening.jl (reference read-only at /root/reference).

Layer A (screening): driver-side tournament control flow + Spark ML
RandomForestClassifier fits + split-frequency importance extraction.
Layer B (featurization): transcripts → sessionization → lag/lead windows →
per-turn aggregates → point-in-time as-of joins → wide feature matrices.
"""

from featurescreening_jl_spark.frame import FeatureFrame
from featurescreening_jl_spark.operators.importance import (
    DEFAULT_CONFIG_FOR_FEATURE_IMPORTANCE,
    DEFAULT_SCREEN_CONFIG,
    feature_importance,
    feature_importance_from_model,
    fit_forest,
    split_counts,
)
from featurescreening_jl_spark.operators.asof_join import asof_join
from featurescreening_jl_spark.operators.screen import screen, screen_xy
from featurescreening_jl_spark.operators.stability import stability_select
from featurescreening_jl_spark.operators.window_features import (
    conversation_aggregates,
    sessionize,
    turn_features,
    with_lag_lead,
)
from featurescreening_jl_spark.sources.checkpoint import RoundCheckpoint
from featurescreening_jl_spark.sources.hdf5 import load_hdf5, save_hdf5
from featurescreening_jl_spark.sources.transcripts import synthetic_transcripts
from featurescreening_jl_spark.operators.selection import (
    ComposedSelectionMode,
    SelectByImportance,
    SelectRandom,
    SelectTop,
    SelectionMode,
    get_count,
    importance,
    importances,
    label,
    make_rng,
    select,
    unit_weights,
)

__version__ = "0.1.0"

__all__ = [
    "FeatureFrame",
    "screen",
    "screen_xy",
    "stability_select",
    "load_hdf5",
    "save_hdf5",
    "feature_importance",
    "feature_importance_from_model",
    "fit_forest",
    "split_counts",
    "DEFAULT_SCREEN_CONFIG",
    "DEFAULT_CONFIG_FOR_FEATURE_IMPORTANCE",
    "asof_join",
    "sessionize",
    "turn_features",
    "with_lag_lead",
    "conversation_aggregates",
    "synthetic_transcripts",
    "RoundCheckpoint",
    "SelectionMode",
    "SelectTop",
    "SelectRandom",
    "SelectByImportance",
    "ComposedSelectionMode",
    "select",
    "get_count",
    "label",
    "importance",
    "importances",
    "unit_weights",
    "make_rng",
    "__version__",
]
