from .trees import Forest, init_forest, decide_left, level_slots, depth_of_slot
from .predict import (
    forest_predict,
    forest_predict_excluded,
    tree_leaf_index,
    tree_predict,
    tree_predict_excluded,
)

__all__ = [
    "Forest",
    "init_forest",
    "decide_left",
    "level_slots",
    "depth_of_slot",
    "forest_predict",
    "forest_predict_excluded",
    "tree_leaf_index",
    "tree_predict",
    "tree_predict_excluded",
]
