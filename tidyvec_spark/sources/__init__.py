from tidyvec_spark.sources.vec_io import write_vec, read_vec

__all__ = ["write_vec", "read_vec"]
