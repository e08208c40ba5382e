from pnpinversion_tpu.control.base import AttnSite, BaseControl, NoControl, NO_CONTROL
