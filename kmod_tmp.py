import jax.numpy as jnp

def make_kernel(W, nb):
    def _kernel(band_re_ref, band_im_ref, xre_ref, xim_ref, yre_ref, yim_ref):
        dtype = band_re_ref.dtype
        acc_r = jnp.zeros((1, nb), dtype=dtype)
        acc_i = jnp.zeros((1, nb), dtype=dtype)
        for s in range(2 * W + 1):
            xr = xre_ref[0, s].reshape(1, nb)
            xi = xim_ref[0, s].reshape(1, nb)
            art = band_re_ref[0, s].T
            ait = band_im_ref[0, s].T
            acc_r = acc_r + (jnp.dot(xr, art, preferred_element_type=dtype)
                             - jnp.dot(xi, ait, preferred_element_type=dtype))
            acc_i = acc_i + (jnp.dot(xi, art, preferred_element_type=dtype)
                             + jnp.dot(xr, ait, preferred_element_type=dtype))
        yre_ref[0] = acc_r.reshape(nb // 128, 128)
        yim_ref[0] = acc_i.reshape(nb // 128, 128)
    return _kernel
