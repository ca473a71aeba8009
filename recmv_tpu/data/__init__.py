from .dataset import (
    SceneDataset,
    PeopleSnapshotDataset,
    LargePoseDataset,
    SyntheticDataset,
    SnugAnimationDataset,
    InitFlDataset,
    ClipSampler,
    RandomSampler,
    SceneParams,
    get_dataset_and_loader,
    init_scene_params,
    trainable_mask,
)
