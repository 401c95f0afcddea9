from cs533_big_data_data_mining_spark.sources.netcdf import (
    netcdf3_decode,
    netcdf3_encode,
    read_clusters_netcdf,
    write_clusters_netcdf,
)
from cs533_big_data_data_mining_spark.sources.points import (
    as_points,
    bin_to_parquet,
    read_points_bin,
    read_points_parquet,
    text_to_parquet,
    write_clusters,
)
from cs533_big_data_data_mining_spark.sources.tables import load_table, load_tables

__all__ = [
    "as_points",
    "bin_to_parquet",
    "read_points_bin",
    "read_points_parquet",
    "text_to_parquet",
    "write_clusters",
    "load_table",
    "load_tables",
    "netcdf3_decode",
    "netcdf3_encode",
    "read_clusters_netcdf",
    "write_clusters_netcdf",
]
