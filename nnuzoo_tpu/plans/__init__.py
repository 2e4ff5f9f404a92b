from .label_handling import (LabelManager, convert_labelmap_to_one_hot,
                             determine_num_input_channels)
from .plans_handler import ConfigurationManager, PlansManager
