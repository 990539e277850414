"""HDF5 interop with the reference's FeatureSet files.

The reference persists feature sets as HDF5 (``save(output, screened_fs)``,
/root/reference/screen:104; format from its FeatureSets.jl dependency:
datasets for labels, feature names, and the dense sample×feature matrix).
This engine's native storage is parquet/Iceberg — columnar, splittable,
predicate-pushdown-able — so HDF5 support is an IMPORT/EXPORT shim for
migrating existing reference files, not a runtime format: HDF5 is a
single-file, driver-side read, only sensible for matrices that fit one
machine (which the reference's always did).

``h5py`` is not part of this engine's runtime dependencies; both functions
degrade to an informative ImportError when it is absent.
"""

from __future__ import annotations

from typing import Optional

from featurescreening_jl_spark.frame import FeatureFrame

__all__ = ["load_hdf5", "save_hdf5"]


def _h5py():
    try:
        import h5py
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "HDF5 interop requires the optional dependency h5py "
            "(pip install h5py). The engine's native formats are "
            "parquet and Iceberg — HDF5 exists only to migrate "
            "FeatureScreening.jl files."
        ) from exc
    return h5py


def load_hdf5(
    spark,
    path: str,
    *,
    labels_key: str = "labels",
    names_key: str = "names",
    features_key: str = "features",
    num_partitions: Optional[int] = None,
) -> FeatureFrame:
    """Read a reference-style HDF5 feature set into a FeatureFrame.

    Driver-side read (HDF5 is not splittable); the resulting frame is
    distributed via ``FeatureFrame.from_arrays``. Dataset keys are
    configurable because FeatureSets.jl file layouts vary by version.
    """
    h5py = _h5py()
    with h5py.File(path, "r") as f:
        labels = [
            v.decode() if isinstance(v, bytes) else str(v)
            for v in f[labels_key][()]
        ]
        names = [
            v.decode() if isinstance(v, bytes) else str(v)
            for v in f[names_key][()]
        ]
        X = f[features_key][()]
    if X.shape == (len(names), len(labels)) and len(names) != len(labels):
        X = X.T  # column-major Julia dump: stored features×samples
    return FeatureFrame.from_arrays(
        spark, labels, names, X, num_partitions=num_partitions
    )


def save_hdf5(
    ff: FeatureFrame,
    path: str,
    *,
    labels_key: str = "labels",
    names_key: str = "names",
    features_key: str = "features",
) -> None:
    """Write a FeatureFrame to a reference-style HDF5 file.

    Collects to the driver — intended for SCREENED outputs (narrow by
    construction: ≤ reduced_size columns), not raw corpora.
    """
    h5py = _h5py()
    pdf = ff.to_pandas()
    with h5py.File(path, "w") as f:
        f.create_dataset(
            labels_key,
            data=[str(v).encode() for v in pdf[ff.label_col].tolist()],
        )
        f.create_dataset(
            names_key, data=[str(n).encode() for n in ff.feature_names]
        )
        f.create_dataset(
            features_key, data=pdf[ff.feature_names].to_numpy(dtype="float64")
        )
