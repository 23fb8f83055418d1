from .dist import AXIS, ShardedCSR, make_dist_gmres_step, partition_csr, shard_vector

__all__ = [
    "AXIS",
    "ShardedCSR",
    "make_dist_gmres_step",
    "partition_csr",
    "shard_vector",
]
