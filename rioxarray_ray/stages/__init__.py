"""Ray Data batch transforms. Every stage is either a pure function over
``pyarrow.Table`` batches (stateless tasks) or a callable class (actor pool)."""
