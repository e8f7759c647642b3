from jimmy_spark.datagen.datasets import (  # noqa: F401
    DATASETS,
    dataset_dir,
    ensure_archives,
    ensure_contacts,
    ensure_dataset,
    ensure_exports,
    ensure_media,
    ensure_roads,
    ensure_tracks,
    ensure_zones,
)
