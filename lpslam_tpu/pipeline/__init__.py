from .config import ConfigOptions, ConfigError, load_config_file
from .manager import SlamManager, SlamStatus
from .sources import ImageSourceBase, FileImageSource, SyntheticSource, ReplaySource
from .processors import (
    ProcessorBase,
    BlackoutImageProcessor,
    AdjustIntensityProcessor,
    CameraCalibrationProcessor,
)
from .trackers import TrackerBase, VSLAMTracker
from .record import RecordEngine, ReplayEngine
