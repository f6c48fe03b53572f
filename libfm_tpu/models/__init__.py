from libfm_tpu.models.fm import (
    FMConfig,
    FMParams,
    fm_batch_predict,
    fm_batch_terms,
    init_fm,
    load_model_text,
    save_model_text,
)

__all__ = [
    "FMConfig",
    "FMParams",
    "fm_batch_predict",
    "fm_batch_terms",
    "init_fm",
    "load_model_text",
    "save_model_text",
]
