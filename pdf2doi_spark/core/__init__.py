"""Pure-Python semantic core (no Spark imports): pattern bank, row kernel,
HTML meta/main-content extraction. Shipped to executors via --py-files and
imported by every Arrow UDF; also used directly as the test oracle."""
