from vit_prisma_tpu.dataloaders.synthetic import (
    InductionDataset, PolygenicInductionDataset, CircleDataset,
    DSpritesDataset, IndexedDataset, train_test_dataset,
)
from vit_prisma_tpu.dataloaders.conceptual_captions import ConceptualCaptionsLocalDataset
from vit_prisma_tpu.dataloaders.imagenet import (
    ImageFolderDataset, ImageNetValidationDataset, numpy_batches,
)
from vit_prisma_tpu.dataloaders.transforms import (
    get_clip_val_transforms, get_model_transforms,
)
from vit_prisma_tpu.dataloaders.imagenet_names import (
    load_imagenet_dict, load_imagenet_emoji, load_imagenet100_classes,
    imagenet_index_from_word,
    get_imagenet_text_labels,
)
from vit_prisma_tpu.dataloaders.cifar import (
    load_cifar_10, get_cifar_transform, CIFAR10_CLASSES,
)
