! Fortran interface to the mptrac_tpu C API (bindings/mptrac_c.h),
! mirroring the reference wrapper /root/reference/src/mptrac_fortran.f90.
! Link against libmptrac_c.so; requires a Fortran 2008 compiler with
! iso_c_binding (none is present in this build image, so this module
! ships untested — the C API underneath is covered by tests).

module mptrac_tpu_mod
  use iso_c_binding, only: c_int, c_double, c_char, c_ptr, c_null_char
  implicit none

  interface
    integer(c_int) function mptrac_c_start() bind(c)
      import :: c_int
    end function

    subroutine mptrac_c_finish() bind(c)
    end subroutine

    integer(c_int) function mptrac_c_create(dirname, ctl_file, &
        atm_file, nargs, args) bind(c)
      import :: c_int, c_char, c_ptr
      character(kind=c_char), intent(in) :: dirname(*), ctl_file(*), &
          atm_file(*)
      integer(c_int), value :: nargs
      type(c_ptr), intent(in) :: args(*)
    end function

    real(c_double) function mptrac_c_t_start(handle) bind(c)
      import :: c_int, c_double
      integer(c_int), value :: handle
    end function

    real(c_double) function mptrac_c_t_stop(handle) bind(c)
      import :: c_int, c_double
      integer(c_int), value :: handle
    end function

    real(c_double) function mptrac_c_time(handle) bind(c)
      import :: c_int, c_double
      integer(c_int), value :: handle
    end function

    integer(c_int) function mptrac_c_step(handle, write_output) bind(c)
      import :: c_int
      integer(c_int), value :: handle, write_output
    end function

    integer(c_int) function mptrac_c_run(handle, write_output) bind(c)
      import :: c_int
      integer(c_int), value :: handle, write_output
    end function

    integer(c_int) function mptrac_c_n_parcels(handle) bind(c)
      import :: c_int
      integer(c_int), value :: handle
    end function

    integer(c_int) function mptrac_c_get_positions(handle, lon, lat, &
        p, cap) bind(c)
      import :: c_int, c_double
      integer(c_int), value :: handle, cap
      real(c_double), intent(out) :: lon(*), lat(*), p(*)
    end function

    integer(c_int) function mptrac_c_write_atm(handle, path) bind(c)
      import :: c_int, c_char
      integer(c_int), value :: handle
      character(kind=c_char), intent(in) :: path(*)
    end function

    integer(c_int) function mptrac_c_destroy(handle) bind(c)
      import :: c_int
      integer(c_int), value :: handle
    end function
  end interface

end module mptrac_tpu_mod
