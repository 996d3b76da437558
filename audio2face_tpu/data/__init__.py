from audio2face_tpu.data.vocaset import (
    VocaDataModule,
    ClipVocaSet,
    DataSplitRecorder,
    TRAINING_SUBJECTS,
    VALIDATION_SUBJECTS,
    TEST_SUBJECTS,
    ALL_SUBJECTS,
    get_human_id_one_hot,
)

__all__ = [
    "VocaDataModule",
    "ClipVocaSet",
    "DataSplitRecorder",
    "TRAINING_SUBJECTS",
    "VALIDATION_SUBJECTS",
    "TEST_SUBJECTS",
    "ALL_SUBJECTS",
    "get_human_id_one_hot",
]
