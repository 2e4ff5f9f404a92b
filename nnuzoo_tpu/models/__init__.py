from .registry import build_network_from_plans, get_model_builder
