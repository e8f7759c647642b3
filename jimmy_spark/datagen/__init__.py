from jimmy_spark.datagen.datasets import DATASETS, dataset_dir, ensure_dataset  # noqa: F401
