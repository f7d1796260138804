from gsjax.train.loss import l1_loss, l2_loss, ssim
from gsjax.train.optimizer import AdamState, adam_init, adam_update, make_lr_tree
from gsjax.train.schedule import expon_lr
