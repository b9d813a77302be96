"""Table sources: testdata parquet readers + the synthetic image table."""
