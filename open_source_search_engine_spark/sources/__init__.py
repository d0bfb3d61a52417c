"""Sources & sinks: corpus synthesizer, driver-testdata loaders, and the
Iceberg-style snapshot/manifest table layer (the Rdb/LSM analog)."""
