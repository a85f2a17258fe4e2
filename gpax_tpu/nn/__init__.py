from .modules import MLP, ConvNet, Module, module_param, random_module

__all__ = ["Module", "MLP", "ConvNet", "random_module", "module_param"]
