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
    orientation: str = "auto",
) -> FeatureFrame:
    """Read a reference-style HDF5 feature set into a FeatureFrame.

    Driver-side read (HDF5 is not splittable); the resulting frame is
    distributed via ``FeatureFrame.from_arrays``. Dataset keys are
    configurable because FeatureSets.jl file layouts vary by version.

    ``orientation`` declares the stored matrix layout:
    ``"samples"`` — samples×features (row-major dump), used as-is;
    ``"features"`` — features×samples (column-major Julia dump), transposed;
    ``"auto"`` — inferred from the shape, raising on a SQUARE matrix where
    both readings are consistent (a silent guess would load a Julia-written
    square feature set transposed). A shape matching neither orientation
    raises immediately with both expected shapes spelled out.
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
    n_samples, n_features = len(labels), len(names)
    by_samples = X.shape == (n_samples, n_features)
    by_features = X.shape == (n_features, n_samples)
    if not by_samples and not by_features:
        raise ValueError(
            f"HDF5 feature matrix {features_key!r} has shape {X.shape}, "
            f"matching neither samples×features {(n_samples, n_features)} "
            f"nor features×samples {(n_features, n_samples)} implied by "
            f"{labels_key!r}/{names_key!r}"
        )
    if orientation == "auto":
        if by_samples and by_features:
            raise ValueError(
                f"HDF5 feature matrix is square ({X.shape}): orientation "
                "cannot be inferred — pass orientation='samples' or "
                "'features' explicitly"
            )
        if by_features:
            X = X.T  # column-major Julia dump: stored features×samples
    elif orientation == "features":
        if not by_features:
            raise ValueError(
                f"orientation='features' expects shape "
                f"{(n_features, n_samples)}, got {X.shape}"
            )
        X = X.T
    elif orientation == "samples":
        if not by_samples:
            raise ValueError(
                f"orientation='samples' expects shape "
                f"{(n_samples, n_features)}, got {X.shape}"
            )
    else:
        raise ValueError(
            f"unknown orientation {orientation!r} "
            "(expected 'auto', 'samples', or 'features')"
        )
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
