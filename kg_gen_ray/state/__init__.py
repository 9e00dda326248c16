from kg_gen_ray.state.lineage import PartitionManifest, read_manifest  # noqa: F401
