from .store import MapStore, MapConfig, empty_map, insert_keyframe_slots
