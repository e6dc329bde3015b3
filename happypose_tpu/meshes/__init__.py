"""Mesh loading and the padded, device-shardable mesh database."""

from happypose_tpu.meshes.io import load_mesh, Mesh
from happypose_tpu.meshes.database import MeshDataBase, BatchedMeshes

__all__ = ["load_mesh", "Mesh", "MeshDataBase", "BatchedMeshes"]
