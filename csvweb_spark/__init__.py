"""csvweb_spark: PySpark-native CSVW knowledge-graph construction engine."""
