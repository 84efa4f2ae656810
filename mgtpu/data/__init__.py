from mgtpu.data.registry import get_loaders, list_datasets
