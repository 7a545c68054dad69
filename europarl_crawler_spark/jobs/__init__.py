"""spark-submit entry points (deployed with --py-files of this package)."""
