from dataprocessingframework_spark.filters.column_filter import ColumnFilter
from dataprocessingframework_spark.filters.data_filter import DataFilter
from dataprocessingframework_spark.filters.transforms import BaseTransform

__all__ = ["ColumnFilter", "DataFilter", "BaseTransform"]
