"""PET module library (adapters, gates, LoRA, IA3, PHM, prompts, hypernets).

TPU-native re-design of the reference PET stack (reference: src/adapters/,
src/lora/, src/prompt/): task-routed adapters are stacked parameters indexed
by a static per-batch task id (one jit cache entry per task), and multihead
adapters are stored per-head for param/init parity but applied as single
fused matmuls so the MXU sees one large GEMM instead of h small ones.
"""

from vlpet_tpu.pet.modules import (
    Activations,
    AdapterController,
    BottleneckAdapter,
    GateLargeX,
    GateLargeXLowRank,
    GateMiddleXYAdd,
    GateSmallXYCat,
    HyperComplexAdapter,
    IA3Vector,
    LoRADense,
    LowRankAdapter,
    LowRankDense,
    MultiheadDownAdapter,
    MultiheadDownUpAdapter,
    MultiheadPairAdapter,
    MultiheadUpAdapter,
    OutputParallelAdapterLayer,
    PHMDense,
    PetContext,
    TaskDense,
)
from vlpet_tpu.pet.prompts import InputPrompts, PromptController
from vlpet_tpu.pet.hypernet import (
    AdapterLayersHyperNetController,
    AdapterLayersOneHyperNetController,
    BlockAdapterWeights,
    MetaLayersAdapterController,
    TaskEmbeddingController,
)
