/**
 * Component plumbing. Every public component is a thin React function
 * component that renders a host element of type "smelter"; the host
 * element's props carry (a) the component's serializable props and (b) its
 * sceneBuilder — the function that turns those props plus already-built
 * children into wire-format scene JSON. The reconciler in smelter-core
 * walks the committed host tree and calls the builders bottom-up.
 */
import type React from 'react';
import { createElement, useId } from 'react';
import type * as Api from './api.js';

/** Font size applied to bare string children promoted into Text nodes. */
export const DEFAULT_FONT_SIZE = 50;

export type ComponentBaseProps = {
  /** Component children. */
  children?: React.ReactNode;
  /** Id of a component. */
  id?: Api.ComponentId;
};

export type SceneComponent = Api.Component | string;
export type SceneBuilder<P> = (props: P, children: SceneComponent[]) => Api.Component;

/** Bare strings inside a layout become Text nodes with the default size. */
export function sceneComponentIntoApi(component: SceneComponent): Api.Component {
  if (typeof component !== 'string') {
    return component;
  }
  return { type: 'text', text: component, font_size: DEFAULT_FONT_SIZE };
}

export function createSmelterComponent<P extends ComponentBaseProps>(
  sceneBuilder: SceneBuilder<P>
): (props: P) => React.ReactNode {
  function SmelterComponent(props: P): React.ReactNode {
    const { children, ...rest } = props;
    // a stable fallback id so transitions can match nodes across updates
    // even when the user didn't set one
    const fallbackId = useId();
    const childList = Array.isArray(children) ? children : [children];
    const hostProps = {
      sceneBuilder,
      props: { ...rest, id: rest.id ?? fallbackId },
    };
    return createElement('smelter', hostProps, ...childList);
  }
  return SmelterComponent;
}
