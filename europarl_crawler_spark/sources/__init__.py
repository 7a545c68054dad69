"""Sources: schemas, synthetic content store, epoch-snapshot storage."""
