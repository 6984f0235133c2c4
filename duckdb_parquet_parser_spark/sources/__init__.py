"""Sources & sinks: Parquet write parity with the reference writer."""
