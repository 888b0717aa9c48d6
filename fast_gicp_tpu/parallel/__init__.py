"""Multi-device scaling: meshes, shard_map objectives, collectives."""
