from webr.oracle.oracle import OracleResult, run_oracle  # noqa: F401
