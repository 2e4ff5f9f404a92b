"""Plans-file editing helpers (reference:
`nnunetv2/tests/integration_tests/add_lowres_and_cascade.py` — plans editing is an
advertised nnU-Net v2 feature; this injects 3d_lowres + 3d_cascade_fullres
configurations derived from 3d_fullres)."""

from copy import deepcopy
from typing import Union

from ..paths import get_preprocessed_folder
from ..utilities.dataset_name_id import maybe_convert_to_dataset_name
from ..utilities.io import join, load_json, save_json


def add_lowres_and_cascade(dataset_name_or_id: Union[int, str],
                           plans_identifier: str = "nnUNetPlans",
                           lowres_spacing_factor: float = 2.0) -> dict:
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    plans_file = join(get_preprocessed_folder(), dataset_name,
                      plans_identifier + ".json")
    plans = load_json(plans_file)
    assert "3d_fullres" in plans["configurations"], \
        "needs a 3d_fullres configuration"
    fullres = plans["configurations"]["3d_fullres"]

    lowres = deepcopy(fullres)
    lowres["data_identifier"] = plans_identifier + "_3d_lowres"
    lowres["spacing"] = [s * lowres_spacing_factor for s in fullres["spacing"]]
    lowres["median_image_size_in_voxels"] = [
        round(i / lowres_spacing_factor)
        for i in fullres["median_image_size_in_voxels"]]
    lowres["batch_dice"] = False
    lowres["next_stage"] = "3d_cascade_fullres"
    plans["configurations"]["3d_lowres"] = lowres
    plans["configurations"]["3d_cascade_fullres"] = {
        "inherits_from": "3d_fullres",
        "previous_stage": "3d_lowres",
    }
    plans["configurations"]["3d_fullres"]["batch_dice"] = True
    save_json(plans, plans_file, sort_keys=False)
    return plans
