from sisr_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from sisr_tpu.parallel.tiling import TiledSR, tile_positions
